"""Unit tests for sampling.py (hash sample, split, decontamination, mix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cliner_spark.sampling import (
    contamination,
    hash_sample,
    mix_weights,
    split_assign,
)


def test_hash_sample_fraction_and_determinism(spark):
    df = spark.range(10000).withColumnRenamed("id", "k")
    a = hash_sample(df, "k")
    n = a.count()
    # expected 26/256 ~ 10.16%; binomial 3-sigma ~ 0.9pp at n=10k
    assert 850 < n < 1200
    assert a.count() == n  # deterministic re-evaluation
    # membership is a pure function of the key: re-derive independently
    b = {r["k"] for r in hash_sample(df, "k").collect()}
    assert {r["k"] for r in a.collect()} == b


def test_split_assign_disjoint_exhaustive(spark):
    df = spark.range(10000).withColumnRenamed("id", "k")
    s = split_assign(df, "k")
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10000
    # ~80/10/10 at 256-bucket granularity (204/26/26)
    assert 0.75 < counts["train"] / 10000 < 0.85
    assert 0.07 < counts["val"] / 10000 < 0.14
    assert 0.07 < counts["test"] / 10000 < 0.14


def test_contamination_hits_known_overlap(spark):
    docs = spark.createDataFrame(
        [
            {"doc_id": 1, "text": "the quick brown fox jumps"},
            {"doc_id": 2, "text": "a quick brown fox appears"},  # shares 3-gram
            {"doc_id": 3, "text": "completely unrelated words here"},
        ]
    )
    bench = docs.filter(F.col("doc_id") == 1)
    hits = {r["doc_id"]: r["n_hits"] for r in contamination(docs, bench, n=3).collect()}
    # doc 2 shares 'quick brown fox' + 'brown fox'? n=3 only: 'quick brown fox'
    assert hits == {2: 1}  # doc 1 excluded as benchmark, doc 3 clean


def test_mix_weights_exact(spark):
    rows = [{"doc_id": i, "src": "a" if i < 6 else "b"} for i in range(8)]
    df = spark.createDataFrame(rows)
    w = {r["src"]: (r["n_docs"], r["weight"]) for r in mix_weights(df, "src").collect()}
    # total=8, k=2 -> target 4 per group: a has 6 (downsample 4/6), b has 2 (upsample 2x)
    assert w["a"] == (6, round(8 / 2 / 6, 6))
    assert w["b"] == (2, 2.0)


def test_curate_end_to_end_flags(spark):
    from cliner_spark.curate import curate, curation_report

    docs = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta eta theta"},
            {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta"},  # exact dup of 0
            {"doc_id": 2, "text": "spam spam spam spam spam spam spam spam"},  # repetitive
            {"doc_id": 3, "text": "one two three four five six seven eight"},  # contaminated
            {"doc_id": 4, "text": "nine ten eleven twelve thirteen fourteen fifteen sixteen"},
        ]
    )
    bench = spark.createDataFrame(
        [{"doc_id": 100, "text": "zzz three four five qqq aaa bbb ccc"}]
    )
    cur = {r["doc_id"]: r for r in curate(docs, bench).collect()}
    assert cur[0]["keep"] and cur[4]["keep"]
    assert not cur[1]["keep_dedup"] and cur[1]["cluster_id"] == 0
    assert not cur[2]["keep_repetition"]
    assert not cur[3]["keep_decontam"]
    # all lengths equal -> length band keeps everything
    assert all(cur[i]["keep_length"] for i in cur)
    assert all(cur[i]["split"] in ("train", "val", "test") for i in cur)

    rep = curation_report(curate(docs, bench)).collect()[0]
    assert rep["n_docs"] == 5 and rep["n_kept"] == 2
    assert rep["n_dup"] == 1 and rep["n_contaminated"] == 1 and rep["n_repetitive"] == 1
