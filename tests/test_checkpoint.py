"""Resumability (SURVEY.md §5.2.4): kill after k buckets, re-run, assert
identical final triples and that completed buckets were skipped."""

from __future__ import annotations

from pyspark.sql import functions as F

from cliner_spark import checkpoint, fixtures
from cliner_spark.pipeline import run_pipeline


def test_resume_skips_done_and_matches_full_run(spark, tmp_path):
    rows = fixtures.gen_transcripts(n_convs=20, avg_turns=6, seed=9)
    tx = fixtures.transcripts_df(spark, rows)
    out_dir = str(tmp_path / "kg")
    n_buckets = 8

    all_buckets = sorted(
        r["b"] for r in tx.select(checkpoint.bucket_col(n_buckets).alias("b")).distinct().collect()
    )
    assert len(all_buckets) > 2
    first_half = all_buckets[: len(all_buckets) // 2]

    # "crash" after the first half of the buckets
    r1 = checkpoint.run_resumable(
        spark, tx, out_dir, run_id="r1", n_buckets=n_buckets, only_buckets=first_half
    )
    assert sorted(r1["new_buckets"]) == sorted(first_half)

    # resume: must process only the remaining buckets
    r2 = checkpoint.run_resumable(spark, tx, out_dir, run_id="r1", n_buckets=n_buckets)
    assert set(r2["new_buckets"]).isdisjoint(first_half)
    assert sorted(r2["buckets_done"]) == all_buckets

    # a third run is a no-op
    r3 = checkpoint.run_resumable(spark, tx, out_dir, run_id="r1", n_buckets=n_buckets)
    assert r3["new_buckets"] == [] and r3["rows_in"] == 0

    # final output identical to a single full run
    resumed = {
        tuple(r)
        for r in spark.read.parquet(f"{out_dir}/triples")
        .select("subj", "pred", "obj")
        .collect()
    }
    full = {
        tuple(r)
        for r in run_pipeline(spark, tx)["triples"].select("subj", "pred", "obj").collect()
    }
    assert resumed == full and len(full) > 100

    # lineage table covers every bucket exactly once with real counts
    lin = checkpoint.lineage(spark, out_dir, "r1")
    buckets = lin.filter(F.col("stage") == "triples")
    per_bucket = buckets.groupBy("partition_key").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sorted(r["partition_key"] for r in per_bucket) == all_buckets
    assert all(r["n"] == 1 for r in per_bucket)
    assert buckets.agg(F.sum("rows_in")).first()[0] == tx.count()
    # wall clock lives on run-level rows only (shared cost is not copied
    # onto every bucket row); bucket rows carry null wall_sec
    runs = lin.filter(F.col("stage") == "run").collect()
    assert len(runs) == 2  # the crashed half + the resume
    assert all(r["wall_sec"] > 0 and r["partition_key"] == -1 for r in runs)
    assert all(r["wall_sec"] is None for r in buckets.collect())


def test_compaction_roundtrip(spark, tmp_path):
    """compact_parquet_dir: many small files -> few ~target-size bins with
    row-for-row identical data; the plan's bins start at multiples of the
    target in cumulative input bytes."""
    from cliner_spark.maintenance import (
        compact_parquet_dir,
        compaction_plan,
        list_data_files,
    )

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 2000).withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    df.repartition(40).write.mode("overwrite").parquet(src)

    listing = list_data_files(spark, src)
    n_small = listing.count()
    assert n_small >= 30  # genuinely a small-file mess

    total = listing.agg(F.sum("bytes")).collect()[0][0]
    target = int(total // 4) + 1
    plan = compaction_plan(listing, target).collect()
    assert {r["bin"] for r in plan} <= set(range(5))

    n_bins = compact_parquet_dir(spark, src, dst, target)
    assert n_bins <= 5
    out = spark.read.parquet(dst)
    assert out.count() == 2000
    assert (
        out.select("id", "payload").exceptAll(df.select("id", "payload")).count() == 0
    )
    out_files = [
        r["path"]
        for b in range(n_bins)
        for r in list_data_files(spark, f"{dst}/bin={b}").collect()
        if r["path"].endswith(".parquet")
    ]
    assert len(out_files) == n_bins < n_small


def test_manifest_stats_prune_files(spark, tmp_path):
    """file_column_stats reads only footers; pruned_read must open strictly
    fewer files than the directory holds when data is clustered by the
    predicate column, and return exactly the rows a full-scan filter
    returns."""
    from cliner_spark.maintenance import file_column_stats, pruned_read

    p = str(tmp_path / "clustered")
    df = spark.range(0, 1000).withColumn(
        "k", F.format_string("k%04d", F.col("id"))
    )
    # repartitionByRange -> files are clustered (disjoint k ranges per file)
    df.repartitionByRange(10, "k").write.mode("overwrite").parquet(p)

    stats = file_column_stats(spark, p, ["k"])
    assert stats.count() == 10
    assert stats.filter(F.col("num_rows") <= 0).count() == 0

    got, n_read, n_total = pruned_read(spark, p, "k", "k0100", "k0199")
    assert n_total == 10 and 0 < n_read < 10
    want = sorted(
        r["id"] for r in df.filter(F.col("k").between("k0100", "k0199")).collect()
    )
    assert sorted(r["id"] for r in got.collect()) == want and len(want) == 100


def test_pipeline_observe_metrics_match_counts(spark):
    """with_metrics=True attaches df.observe at stage boundaries: the
    observed row counts equal real counts and cost zero extra jobs (they
    ride the sink action)."""
    from cliner_spark import fixtures
    from cliner_spark.pipeline import run_pipeline

    tx = fixtures.transcripts_df(spark)
    out = run_pipeline(spark, tx, with_metrics=True)
    n_triples = out["triples"].count()  # the single action
    m = {k: v.get["rows"] for k, v in out["metrics"].items()}
    assert m["triples"] == n_triples
    assert m["mentions"] == out["mentions"].count()
    assert m["turns"] > 0
