"""Distributed exact dense-rank.

A global ``Window.orderBy(...)`` is the textbook single-partition trap: Spark
moves the whole relation to one task, which caps every rank-based operator at
one core and one executor's memory. The standard distributed construction
(the same one TeraSort and the suffix-array literature use) is:

1. ``repartitionByRange`` on the order key — Spark's ``RangePartitioner``
   maps each key through a binary search over sampled boundaries, so the
   partition id is a pure function of the key and EQUAL KEYS NEVER STRADDLE
   a partition boundary;
2. dense-rank locally inside each range partition (a partitioned window —
   parallel, whole-stage-codegen'd);
3. shift each partition's local ranks by the summed distinct-key counts of
   the partitions before it (one ≤``num_partitions``-row aggregate collected
   to the driver and rebroadcast as a literal map).

Because no key straddles, local-rank + offset equals the exact global dense
rank, bit-identical to a single-node ``dense_rank()`` — which is what keeps
the DuckDB oracle hash-green while the Spark side stays parallel.

The ranged frame is ``localCheckpoint``-pinned before the stats pass so the
sampled range boundaries (and hence the partition ids the offsets were
computed for) cannot be re-drawn when the downstream plan re-executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__dr_pid"
_LOCAL = "__dr_local"


def dist_dense_rank(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Append exact global ``dense_rank() OVER (ORDER BY order_cols)`` as
    ``out`` without ever collapsing the relation to one partition.

    Order columns must be non-null (ascending, the shared Spark/DuckDB
    default for non-null keys) and ``out`` must not collide with them.
    """
    if out in order_cols:
        raise ValueError(f"out column {out!r} collides with order_cols")
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    stats = ranged.groupBy(_PID).agg(F.countDistinct(*order_cols).alias("nd")).collect()
    offsets: dict[int, int] = {}
    cum = 0
    for row in sorted(stats, key=lambda r: r[_PID]):
        offsets[row[_PID]] = cum
        cum += row["nd"]
    off = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col(_PID),
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        ranged.withColumn(_LOCAL, F.dense_rank().over(w))
        .withColumn(out, (F.col(_LOCAL) + off).cast("bigint"))
        .drop(_PID, _LOCAL)
    )


def dist_cumsum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out: str = "cumsum",
    num_partitions: int = 32,
) -> DataFrame:
    """Append the exact inclusive prefix sum of ``val_col`` in
    ``order_cols`` order without a global window: range-partition on the
    order key, running-sum inside each partition, shift by the summed
    totals of the partitions before it (one ≤``num_partitions``-row
    aggregate collected once). Order keys must be non-null and UNIQUE per
    row — with duplicate keys an inclusive running sum is order-ambiguous
    (both engines' RANGE window frames would instead assign ties their
    group total, which is a different operator).
    """
    if out in order_cols or out == val_col:
        raise ValueError(f"out column {out!r} collides with inputs")
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    stats = ranged.groupBy(_PID).agg(F.sum(val_col).alias("tot")).collect()
    offsets: dict[int, int] = {}
    cum = 0
    for row in sorted(stats, key=lambda r: r[_PID]):
        offsets[row[_PID]] = cum
        cum += int(row["tot"] or 0)
    off = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col(_PID),
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn(_LOCAL, F.sum(val_col).over(w))
        .withColumn(out, (F.col(_LOCAL) + off).cast("bigint"))
        .drop(_PID, _LOCAL)
    )
