"""Deterministic corpus-curation operators for training-data pipelines:
hash sampling, train/val/test splits, eval-set decontamination, and
domain-mixture weights.

Sampling and splitting use *hex-bucket hashing*: bucket(key) = first
`nchars` hex chars of md5(key), giving 256 uniform buckets at nchars=2.
Thresholds are hex-string comparisons ('1a' ≈ 10.16%, 'cc' ≈ 79.7%), so
membership is a pure function of the key — stable across runs, engines,
partitionings, and data order, which is what makes a split reproducible at
10^12 rows and lets DuckDB hash-check it. md5 (not xxhash64) is the
deliberate engine-reproducibility choice shared with dedup.py; swap the
expression for xxhash64 bucketing in production if md5 cost ever shows up
(it does not: one hash per row, inside whole-stage codegen).

Decontamination follows the published n-gram overlap recipe (GPT-3
appendix A / Gopher: remove training docs sharing ≥1 13-gram with an eval
benchmark): shingle both sides, broadcast the benchmark shingle set
(benchmarks are tiny relative to the corpus), count distinct collisions
per candidate doc. No all-pairs anywhere — the join is candidate-shingle ×
benchmark-shingle equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cliner_spark.dedup import shingles

# hex thresholds: 256-bucket granularity
SAMPLE_10PCT = "1a"  # 26/256
TRAIN_BOUND = "cc"  # 204/256 ~ 80%
VAL_BOUND = "e6"  # 230/256 ~ 90% (val = 26/256 ~ 10%)


def hex_bucket(col, nchars: int = 2):
    """First `nchars` hex chars of md5(key) — a uniform, engine-portable
    bucket id. String comparison against a hex literal selects a fraction
    at 16^-nchars granularity."""
    return F.substring(F.md5(col.cast("string")), 1, nchars)


def hash_sample(df: DataFrame, key_col: str, hex_lt: str = SAMPLE_10PCT) -> DataFrame:
    """Deterministic ~(frac) sample: rows whose bucket < hex_lt. Appends
    the bucket column for auditability."""
    b = hex_bucket(F.col(key_col), len(hex_lt))
    return df.withColumn("bucket", b).filter(F.col("bucket") < hex_lt)


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    thresholds: dict[str, str],
    default: str = "00",
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum gets its own hex
    bound (e.g. keep 50% of rare-language docs but 5% of English), rows
    selected by the same engine-portable md5 bucket as hash_sample. The
    stratum→bound map is a literal map expression — no join, no shuffle,
    fully pushed into the scan stage; strata absent from the map default
    to `default` ("00" = drop).
    """
    m = F.create_map(*[F.lit(x) for kv in thresholds.items() for x in kv])
    b = hex_bucket(F.col(key_col), 2)
    thr = F.coalesce(m[F.col(stratum_col)], F.lit(default))
    return (
        df.withColumn("bucket", b)
        .filter(F.col("bucket") < thr)
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    train_lt: str = TRAIN_BOUND,
    val_lt: str = VAL_BOUND,
) -> DataFrame:
    """80/10/10 (by default) train/val/test assignment, pure function of
    the key: same row lands in the same split on every run and engine."""
    b = hex_bucket(F.col(key_col), 2)
    return df.withColumn(
        "split",
        F.when(b < train_lt, F.lit("train"))
        .when(b < val_lt, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits): candidate docs sharing ≥1 token n-gram with any
    benchmark doc. `benchmark` rows are excluded from candidates by id.
    Production default n=13 per the published decontamination recipes;
    tests/driver queries use smaller n to suit their tiny vocabularies.

    Scale: benchmark shingle set is broadcast (eval suites are ≪ corpus);
    candidate shingles stream through the equi-join without a corpus-side
    shuffle beyond the per-doc aggregation.
    """
    bench_sh = F.broadcast(
        shingles(benchmark, n, id_col, text_col).select("shingle").distinct()
    )
    # broadcast the exclusion set too: a sort-merge anti-join here would
    # shuffle the full corpus just to drop the handful of benchmark ids
    cand = docs.join(F.broadcast(benchmark.select(id_col)), id_col, "left_anti")
    cand_sh = shingles(cand, n, id_col, text_col)
    return (
        cand_sh.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.countDistinct("shingle").alias("n_hits"))
    )


def mix_weights(df: DataFrame, group_col: str) -> DataFrame:
    """Per-group resampling weight to reach a uniform domain mixture:
    weight(g) = (total/k) / n_g — >1 means upsample, <1 downsample.
    Two aggregations, the 1-row totals broadcast; no driver scalars."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct(group_col).alias("k"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.round(
            F.col("total").cast("double") / F.col("k") / F.col("n_docs"), 6
        ).alias("weight"),
    )
