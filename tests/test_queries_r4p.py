"""Independent-oracle replica tests for the suffix-array batch
(q_suffix_ranks) and a direct unit test of the distributed dense-rank
primitive it rides on (cliner_spark.ranking.dist_dense_rank)."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry
from cliner_spark.ranking import dist_dense_rank

SF = "/root/testdata/sf0.001"


def test_dist_dense_rank_matches_serial(spark):
    # adversarial key distribution: heavy duplicates, ties everywhere,
    # more partitions than distinct keys
    data = [(i, f"k{(i * 7) % 13:02d}", i % 5) for i in range(500)]
    df = spark.createDataFrame(data, "id INT, ka STRING, kb INT")
    got = {
        r["id"]: r["r"]
        for r in dist_dense_rank(df, ["ka", "kb"], out="r", num_partitions=16).collect()
    }
    keys = sorted({(ka, kb) for _, ka, kb in data})
    rank_of = {k: i + 1 for i, k in enumerate(keys)}
    assert len(got) == 500
    for i, ka, kb in data:
        assert got[i] == rank_of[(ka, kb)]


def test_suffix_ranks_match_16token_windows(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(text,'') FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    keys = {}
    for doc_id, text in docs:
        toks = [t.lower() for t in text.strip().split()] if text.strip() else []
        for pos in range(len(toks)):
            keys[(doc_id, pos)] = tuple(toks[pos : pos + 16])
    # prefix doubling with an end-of-doc sentinel that sorts first is
    # exactly lexicographic order of the (truncated) 16-token windows:
    # Python tuple comparison puts the shorter prefix first, same as the
    # rank-0 sentinel
    ordered = sorted(set(keys.values()))
    rank_of = {k: i + 1 for i, k in enumerate(ordered)}
    sizes = {}
    for k in keys.values():
        sizes[k] = sizes.get(k, 0) + 1

    rows = entry.queries()["q_suffix_ranks"](spark, SF).collect()
    assert len(rows) == len(keys)
    for r in rows:
        k = keys[(r["doc_id"], r["pos"])]
        assert r["rank16"] == rank_of[k]
        assert r["group_size"] == sizes[k]
        assert r["is_dup"] == (sizes[k] > 1)
    # fixture non-vacuity: repeated 16-token windows exist (short tail
    # suffixes collide across docs) AND unique ones exist
    assert any(r["is_dup"] for r in rows)
    assert any(not r["is_dup"] for r in rows)
