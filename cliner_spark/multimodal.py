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


_FRAME_SCHEMA = "media_id bigint, frame_idx int, n_bytes bigint, frame_hex string"


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, stride: int = 2, crop_bytes: int = 16
) -> DataFrame:
    """Frame sampling over opaque binary payloads (driver mandate: the
    frame-sample member of the multimodal family).

    The payload is treated as a sequence of fixed-size frames; every
    `stride`-th frame is sampled and cropped to `crop_bytes` (the byte-level
    analog of decode->sample->resize). With real video the per-payload loop
    body is where a demuxer slices packets — inherently a per-payload
    library call; byte-granular slicing exercises identical Spark plumbing
    (binary Arrow batches, fixed output schema, one mapInPandas pass, zero
    shuffle) without codecs, and is exactly reproducible by the SQL oracle
    via hex-space substrings.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, hexes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_bytes : i * frame_bytes + crop_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(fr))
                    hexes.append(fr.hex())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_hex": pd.Series(hexes, dtype="object"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=_FRAME_SCHEMA)


def frame_dedup(
    media: DataFrame,
    frame_bytes: int = 32,
    stride: int = 2,
    crop_bytes: int = 16,
) -> DataFrame:
    """Cross-media duplicated frames: sampled frames (sample_frames) that
    occur in >= 2 distinct media payloads — the repeated-intro /
    shared-asset signal a video/image pipeline dedups on. One aggregation
    keyed by frame content hash; representative = (min media, then min
    frame_idx within that media), computed with a single min over a
    (media_id, frame_idx) struct so no second pass or window is needed.
    """
    frames = sample_frames(media, frame_bytes, stride, crop_bytes)
    return (
        frames.groupBy(F.md5("frame_hex").alias("frame_md5"))
        .agg(
            F.count_distinct("media_id").alias("n_media"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("media_id", "frame_idx")).alias("_rep"),
        )
        .filter(F.col("n_media") >= 2)
        .select(
            "frame_md5",
            "n_media",
            "n_occurrences",
            F.col("_rep.media_id").alias("rep_media"),
            F.col("_rep.frame_idx").alias("rep_frame_idx"),
        )
    )


def extract_features_arrow(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInArrow twin of extract_features: the same byte-histogram
    featurization operating on pyarrow RecordBatches directly — no
    pandas materialization of the binary column, which at real payload
    sizes (images/audio are MBs per row) avoids one full copy per batch
    and pandas' object-dtype overhead. Output is row-identical to
    extract_features (the parity test pins this), so callers can choose
    the surface per payload size: pandas for convenience, Arrow for
    large-binary hot paths."""
    import pyarrow as pa

    def run(batches):
        import hashlib

        for batch in batches:
            media_ids = batch.column("media_id")
            payloads = batch.column("payload")
            feats, hists, shas, sizes = [], [], [], []
            for p in payloads:
                b = p.as_py() if p.is_valid else b""
                b = b if b is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                hist = [0] * feature_dim
                for byte in b:
                    hist[byte % feature_dim] += 1
                total = sum(hist) or 1
                hists.append(hist)
                feats.append([round(v / total, 6) for v in hist])
            yield pa.RecordBatch.from_arrays(
                [
                    media_ids,
                    pa.array(sizes, type=pa.int64()),
                    pa.array(shas, type=pa.string()),
                    pa.array(feats, type=pa.list_(pa.float64())),
                    pa.array(hists, type=pa.list_(pa.int64())),
                ],
                names=["media_id", "n_bytes", "sha256", "feature", "hist"],
            )

    return media.select("media_id", "payload").mapInArrow(
        run, schema=_FEATURE_SCHEMA
    )
