"""Multimodal column plumbing (driver mandate): image/audio/video handled as
opaque `binary` columns with typed metadata. The container has no codec
libraries, so the decode step is a clearly-marked deterministic STUB — but
the Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partition behavior) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("sha256", T.StringType(), False),
        ]), True),
    ]
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from any text table: payload = utf-8 bytes (the
    opaque-binary stand-in), typed metadata computed JVM-side."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = (
    "media_id bigint, n_bytes bigint, sha256 string, feature array<double>, "
    "hist array<bigint>"
)


def decode_stub(payload: bytes) -> None:
    """Real decode would use PIL/ffmpeg — not present in this container."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The 'feature' vector is a deterministic fake (byte histogram folded to
    feature_dim buckets, L1-normalized) standing in for a real decoder+CNN;
    the Arrow plumbing — binary columns batched through pandas, fixed output
    schema, per-partition iteration — is exactly what a real extractor uses.
    Raw integer counts are kept alongside in 'hist' so downstream consumers
    (and the SQL oracle twin) can compare exactly, with no float formatting.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, hists, shas, sizes = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                hist = [0] * feature_dim
                for byte in b:
                    hist[byte % feature_dim] += 1
                total = sum(hist) or 1
                hists.append(hist)
                feats.append([round(v / total, 6) for v in hist])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha256": shas,
                    "feature": feats,
                    "hist": hists,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)
