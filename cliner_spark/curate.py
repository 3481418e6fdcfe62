"""End-to-end corpus curation: compose the individual operators
(near-dup clustering, eval-set decontamination, repetition filter,
length-band filter, train/val/test split) into the single pass a
training-data pipeline actually runs before a corpus ships.

Every document gets a per-stage keep flag plus the final verdict, so the
output doubles as the drop-reason manifest — curation decisions must be
auditable, not just applied. All stages are the already-tested operators;
this module only wires them:

  keep_dedup      doc is its near-dup cluster representative (min id;
                  dedup.dup_clusters — exact dups are Jaccard-1.0 pairs)
  keep_decontam   no token n-gram shared with the benchmark set
                  (sampling.contamination, broadcast benchmark)
  keep_repetition dup2_frac ≤ rep_max (textstats.repetition_features)
  keep_length     n_tokens within the corpus [lo_p, hi_p] percentile band
  split           hex-bucket hash split (sampling.split_assign)

Scale notes: the only corpus-wide shuffles are the ones the component
operators already pay (shingle index for clustering, one aggregation for
the percentile bounds — computed with exact percentile here for oracle
parity, approx_percentile at 100 TB). The per-stage flags join back on the
id column; flag tables are id-grain, not text-grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cliner_spark.dedup import dup_clusters
from cliner_spark.sampling import contamination, split_assign
from cliner_spark.textstats import repetition_features


def length_bounds(
    df: DataFrame, col: str, lo_p: float = 0.05, hi_p: float = 0.95
) -> DataFrame:
    """1-row (lo, hi) exact percentile bounds — broadcast into the filter."""
    return df.agg(
        F.percentile(F.col(col), F.lit(lo_p)).alias("lo"),
        F.percentile(F.col(col), F.lit(hi_p)).alias("hi"),
    )


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    contam_n: int = 3,
    rep_max: float = 0.5,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """docs + (cluster_id, keep_dedup, keep_decontam, keep_repetition,
    keep_length, keep, split). Filter on `keep` for the curated corpus;
    aggregate the flags for the drop-reason report."""
    clusters = dup_clusters(
        docs, min_jaccard=min_jaccard, id_col=id_col, text_col=text_col
    )
    rep = repetition_features(docs, id_col=id_col, text_col=text_col)
    bounds = length_bounds(rep, "n_tokens", lo_p, hi_p)

    out = (
        docs.join(clusters, id_col)
        .join(rep.select(id_col, "n_tokens", "dup2_frac"), id_col)
        .crossJoin(F.broadcast(bounds))
        .withColumn("keep_dedup", F.col(id_col) == F.col("cluster_id"))
        .withColumn("keep_repetition", F.col("dup2_frac") <= rep_max)
        .withColumn(
            "keep_length",
            (F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")),
        )
        .drop("lo", "hi")
    )
    if benchmark is not None:
        hits = contamination(docs, benchmark, n=contam_n, id_col=id_col, text_col=text_col)
        out = out.join(
            F.broadcast(hits.select(id_col, "n_hits")), id_col, "left"
        ).withColumn("keep_decontam", F.col("n_hits").isNull()).drop("n_hits")
    else:
        out = out.withColumn("keep_decontam", F.lit(True))
    out = out.withColumn(
        "keep",
        F.col("keep_dedup")
        & F.col("keep_decontam")
        & F.col("keep_repetition")
        & F.col("keep_length"),
    )
    return split_assign(out, id_col)


def curation_report(curated: DataFrame) -> DataFrame:
    """Drop-reason rollup: one aggregation over the flag columns."""
    return curated.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("int")).alias("n_kept"),
        F.sum((~F.col("keep_dedup")).cast("int")).alias("n_dup"),
        F.sum((~F.col("keep_decontam")).cast("int")).alias("n_contaminated"),
        F.sum((~F.col("keep_repetition")).cast("int")).alias("n_repetitive"),
        F.sum((~F.col("keep_length")).cast("int")).alias("n_length_outlier"),
    )
