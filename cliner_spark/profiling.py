"""Table profiling: per-column completeness/cardinality/range stats and
value histograms — the data-quality checks a pipeline runs before and after
every large transform.

profile_table computes ALL columns' stats in ONE aggregation pass (a single
scan; the per-column rows are exploded from the 1-row aggregate, not
produced by per-column jobs). n_distinct is exact count(DISTINCT) here so
the DuckDB oracle can hash-check it; at 100 TB swap in
approx_count_distinct (HLL) — the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) per column.

    min/max are computed on the native type (so numeric ordering is
    numeric) and cast to string only for the uniform output schema.
    """
    cols = cols if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_rows").cast("bigint").alias("n_rows"),
                F.col(f"{c}__nulls").cast("bigint").alias("n_nulls"),
                F.col(f"{c}__distinct").cast("bigint").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("s")).select("s.*")


def key_skew(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Heavy-hitter skew profile for a prospective join/groupBy key:
    (key, n, share, skew) for the top_k hottest keys, skew = n / mean
    count per key. skew ≈ straggler factor if the key were shuffled on
    directly — the pre-pass that decides whether a join needs salting
    (triples.salted_partition_col) or AQE skew-join can handle it.

    One map-side-combined count over the key; the count table can itself be
    huge (billions of distinct keys), so NO global window touches it: top-k
    goes through orderBy().limit() (Spark's distributed TakeOrdered — per-
    partition heaps, driver merge of k·p rows) and the totals are a 1-row
    aggregate broadcast-cross-joined onto the k survivors. The count table
    is checkpointed once so the totals pass reuses it instead of re-scanning
    the input.
    """
    from pyspark.sql import Window

    counts = (
        df.groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("n").alias("_tot"), F.avg("n").alias("_mean")
    )
    top = (
        counts.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        "key",
        "n",
        F.round(F.col("n") / F.col("_tot"), 6).alias("share"),
        F.round(F.col("n") / F.col("_mean"), 4).alias("skew"),
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("key").asc()))
        .alias("rank"),
    )


def histogram(
    df: DataFrame, col: str, width: float, min_val: float = 0.0
) -> DataFrame:
    """Fixed-width value histogram: bucket = floor((x - min_val) / width).
    One partial-aggregated groupBy; nulls are excluded."""
    b = F.floor((F.col(col) - min_val) / width).cast("bigint")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo", (F.col("bucket") * width + min_val))
        .select("bucket", "lo", "n")
    )
