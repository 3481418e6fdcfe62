"""Resumable per-partition checkpointing + lineage/metrics (SURVEY.md §4.3,
A5; north rule: "checkpoints per-partition progress with lineage + metrics
tables for resumability").

Unit of resumability: a conv-hash BUCKET (pmod(xxhash64(conv_id), n_buckets)).
Every conversation maps to exactly one bucket, so bucket-level restarts never
split a conversation (the per-turn ordering invariant survives resume).

Protocol (idempotent, crash-safe):
  1. read progress table; completed = buckets with status='done' for run_id
  2. anti-filter input to the remaining buckets (partition pruning: bucket is
     also the physical partition column of the sink, so completed buckets are
     never rescanned or rewritten)
  3. run the pipeline on the remainder; sink with
     partitionBy(bucket) + dynamic partition overwrite — a re-run of a
     half-written bucket simply overwrites it (exactly-once per bucket)
  4. append one progress row per completed bucket + one metrics row per stage

At 10^12 turns: progress/metrics tables are tiny (n_buckets rows/run); the
anti-filter is a broadcast of a list of ints; dynamic overwrite commits are
per-partition-directory, the standard Iceberg/Hive pattern (`writeTo` with
`overwritePartitions` on Iceberg; parquet + dynamic mode in-sandbox).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cliner_spark.pipeline import run_pipeline

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_key", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("wall_sec", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def bucket_col(n_buckets: int, col: str = "conv_id") -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def read_progress(spark: SparkSession, progress_path: str) -> DataFrame:
    try:
        return spark.read.parquet(progress_path)
    except Exception:  # noqa: BLE001 - first run: no table yet
        return spark.createDataFrame([], PROGRESS_SCHEMA)


def completed_buckets(spark: SparkSession, progress_path: str, run_id: str) -> list[int]:
    prog = read_progress(spark, progress_path)
    return [
        r["partition_key"]
        for r in prog.filter(
            (F.col("run_id") == run_id)
            & (F.col("stage") == "triples")
            & (F.col("status") == "done")
        )
        .select("partition_key")
        .distinct()
        .collect()
    ]


def append_progress(spark: SparkSession, progress_path: str, rows: list[dict]) -> None:
    now = time.time()
    df = spark.createDataFrame(
        [
            {
                **r,
                "ts": None,
            }
            for r in rows
        ],
        PROGRESS_SCHEMA,
    ).withColumn("ts", F.timestamp_seconds(F.lit(now)))
    df.write.mode("append").parquet(progress_path)


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    gazetteer: DataFrame | None = None,
    n_buckets: int = 64,
    run_id: str | None = None,
    scanner: str = "udf",
    only_buckets: list[int] | None = None,
) -> dict:
    """Run (or resume) the KG pipeline; returns summary dict.

    `only_buckets` restricts processing (used by tests to simulate a crash
    after k buckets; in production a kill between sink-commit and
    progress-append re-does at most the in-flight buckets, idempotently).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    triples_path = f"{out_dir}/triples"
    progress_path = f"{out_dir}/progress"

    done = completed_buckets(spark, progress_path, run_id)
    tx = transcripts.withColumn("_bucket", bucket_col(n_buckets))
    remaining = tx.filter(~F.col("_bucket").isin(done)) if done else tx
    if only_buckets is not None:
        remaining = remaining.filter(F.col("_bucket").isin(only_buckets))

    t0 = time.time()
    n_in = remaining.count()
    if n_in == 0:
        return {"run_id": run_id, "buckets_done": sorted(done), "new_buckets": [],
                "rows_in": 0, "rows_out": 0}

    out = run_pipeline(spark, remaining.drop("_bucket"), gazetteer=gazetteer, scanner=scanner)
    triples = out["triples"].withColumn("_bucket", bucket_col(n_buckets))

    # dynamic partition overwrite for this write only — restore the caller's
    # session conf afterwards so unrelated overwrites keep their semantics
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            triples.repartition("_bucket")
            .sortWithinPartitions("conv_id", "turn_idx", "pred", "subj", "obj")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(triples_path)
        )
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    per_bucket = {
        r["_bucket"]: (r["n_in"], 0)
        for r in remaining.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n_in")).collect()
    }
    for r in (
        spark.read.parquet(triples_path)
        .filter(F.col("_bucket").isin(list(per_bucket)))
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("n_out"))
        .collect()
    ):
        b = r["_bucket"]
        per_bucket[b] = (per_bucket[b][0], r["n_out"])

    # wall clock is shared across the whole run (buckets execute together in
    # one Spark job), so it is recorded ONCE on a run-level row rather than
    # copied onto every bucket row, which would misattribute per-bucket cost
    wall = time.time() - t0
    append_progress(
        spark,
        progress_path,
        [
            {
                "run_id": run_id,
                "stage": "triples",
                "partition_key": int(b),
                "status": "done",
                "rows_in": int(ri),
                "rows_out": int(ro),
                "wall_sec": None,
            }
            for b, (ri, ro) in per_bucket.items()
        ]
        + [
            {
                "run_id": run_id,
                "stage": "run",
                "partition_key": -1,
                "status": "done",
                "rows_in": int(n_in),
                "rows_out": int(sum(ro for (_ri, ro) in per_bucket.values())),
                "wall_sec": wall,
            }
        ],
    )
    new = sorted(per_bucket)
    return {
        "run_id": run_id,
        "buckets_done": sorted(set(done) | set(new)),
        "new_buckets": new,
        "rows_in": n_in,
        "rows_out": sum(ro for (_ri, ro) in per_bucket.values()),
    }


def lineage(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    """Per-partition lineage view: what was processed when, with row counts."""
    return (
        read_progress(spark, f"{out_dir}/progress")
        .filter(F.col("run_id") == run_id)
        .orderBy("partition_key", "ts")
    )
