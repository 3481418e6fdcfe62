"""Round-3 query registrations.

Same contract as queries_r2: every @register pairs a Spark DataFrame plan
with a DuckDB ANSI-SQL oracle twin over the driver's parquet tables, column
names/types aligned on both sides. Imported by entry_queries AFTER all
helpers exist; R3_NAMES (newest work, highest verification priority) feeds
the front of entry_queries.DRIVER_PRIORITY so the driver's 50-row
correctness window always covers the current round first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cliner_spark.entry_queries import (  # noqa: F401
    REGISTRY,
    load,
    load_docs,
    register,
)

# Names registered by this module, in driver-verification priority order.
R3_NAMES: list[str] = []


def _register_r3(name: str, sql: str | None):
    """@register that also appends to R3_NAMES (driver-window priority)."""

    def deco(fn):
        R3_NAMES.append(name)
        return register(name, sql)(fn)

    return deco


# --------------------------------------------------------------------------
# Round 3a: pure-JVM window twin of the cogrouped-pandas as-of join
# (r2 verdict item 6 — the last >10 s Python surface gets a demonstrably
# cheaper whole-stage-codegen plan producing the identical result)
# --------------------------------------------------------------------------

# identical oracle to q_cogroup_asof: native DuckDB ASOF LEFT JOIN
_ASOF_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, max(value) AS rv FROM events
      WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT l.event_id, l.user_id, l.ts, r.rv AS last_right_value,
       epoch_ms(l.ts) - epoch_ms(r.ts) AS gap_ms
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
"""


@_register_r3("q_asof_union_window", _ASOF_SQL)
def q_asof_union_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join as a UNION + last_value window — the built-in
    twin of q_cogroup_asof (same DuckDB ASOF JOIN oracle, byte-identical
    result): tag left (clicks) and pre-aggregated right (purchases) rows,
    sort within user by (ts, side) with right-before-left on ties so
    r.ts <= l.ts is inclusive, and carry the last non-null right value /
    timestamp forward with an ignorenulls last() over ROWS UNBOUNDED
    PRECEDING. The whole plan is one shuffle on user_id and stays inside
    WholeStageCodegen — no Python workers, no Arrow transfer — which is why
    it beats the cogrouped-pandas formulation at any scale. Gap in whole
    ms via integer unix_micros div (exactly DuckDB's epoch_ms floor; the
    synthetic ts carries microsecond fractions so float ms would be
    engine-dependent)."""
    ev = load(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("rv"),
        F.lit(None).cast("timestamp").alias("rts"),
        F.lit(1).alias("is_left"),
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("rv"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            "rv",
            F.col("ts").alias("rts"),
            F.lit(0).alias("is_left"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("last_right_value", F.last("rv", ignorenulls=True).over(w))
        .withColumn("lrts", F.last("rts", ignorenulls=True).over(w))
    )
    # parquet ts is TIMESTAMP_NTZ; session tz is pinned UTC (session.py) so
    # the cast reads the wall-clock as UTC — DuckDB's naive-epoch_ms algebra
    ms = lambda c: F.expr(  # noqa: E731
        f"unix_micros(cast({c} as timestamp)) div 1000"
    )
    return carried.filter(F.col("is_left") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "last_right_value",
        (ms("ts") - ms("lrts")).cast("bigint").alias("gap_ms"),
    )
