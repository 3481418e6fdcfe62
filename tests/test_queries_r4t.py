"""Independent-oracle replica tests for the storage/IR + sampling batch
(q_postings_varint / q_histogram_quality / q_systematic_pps), plus a
direct unit test of dist_cumsum."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

import __spark_entry__ as entry
from cliner_spark.ranking import dist_cumsum

SF = "/root/testdata/sf0.001"
B = 101


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, coalesce(text,''), n_chars "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_dist_cumsum_matches_serial(spark):
    data = [(f"k{i:04d}", (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(data, "k STRING, v INT")
    got = {r["k"]: r["c"] for r in dist_cumsum(df, ["k"], "v", out="c", num_partitions=16).collect()}
    run = 0
    for k, v in sorted(data):
        run += v
        assert got[k] == run


def _varint(g: int) -> int:
    return 1 if g < 128 else 2 if g < 16384 else 3 if g < 2097152 else 4 if g < 268435456 else 5


def test_postings_varint_matches_replica(spark):
    postings = defaultdict(set)
    for doc_id, text, _ in _docs():
        for t in text.strip().split():
            postings[t.lower()].add(doc_id)
    buckets = defaultdict(lambda: [0, 0, 0, 0])  # terms, postings, vbytes, gbits
    for t, ids in postings.items():
        ids = sorted(ids)
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        df = len(ids)
        bkt = df.bit_length()
        row = buckets[bkt]
        row[0] += 1
        row[1] += df
        row[2] += sum(_varint(g) for g in gaps)
        row[3] += sum(2 * g.bit_length() - 1 for g in gaps)
    rows = entry.queries()["q_postings_varint"](spark, SF).collect()
    assert {r["df_bucket"] for r in rows} == set(buckets)
    for r in rows:
        terms, n_post, vb, gb = buckets[r["df_bucket"]]
        assert (r["n_terms"], r["n_postings"]) == (terms, n_post)
        assert r["raw_bytes"] == 8 * n_post
        assert (r["varint_bytes"], r["gamma_bits"]) == (vb, gb)
        # compression sanity: varint never beats 1 byte/posting, never
        # exceeds raw
        assert n_post <= r["varint_bytes"] <= r["raw_bytes"]


def test_histogram_quality_matches_replica(spark):
    vals = sorted((nc, d) for d, _, nc in _docs())
    xs = [x for x, _ in vals]
    mn, mx, n = min(xs), max(xs), len(xs)
    exp = defaultdict(lambda: [0, 0, 0])
    for x in xs:
        b = min(7, ((x - mn) * 8) // (mx - mn + 1))
        exp[("ew", b)][0] += 1
        exp[("ew", b)][1] += x
        exp[("ew", b)][2] += x * x
    for i, (x, _) in enumerate(vals):
        b = (i * 8) // n
        exp[("ed", b)][0] += 1
        exp[("ed", b)][1] += x
        exp[("ed", b)][2] += x * x
    rows = entry.queries()["q_histogram_quality"](spark, SF).collect()
    assert len(rows) == 16
    for r in rows:
        cnt, sx, sxx = exp.get((r["scheme"], r["bin"]), (0, 0, 0))
        assert (r["n"], r["sum_x"], r["sum_xx"]) == (cnt, sx, sxx)
        assert r["var_num"] == (cnt * sxx - sx * sx if cnt else 0)
        assert r["var_num"] >= 0
    # equi-depth bins differ by at most 1 in count
    ed = [r["n"] for r in rows if r["scheme"] == "ed"]
    assert max(ed) - min(ed) <= 1 and sum(ed) == n


def test_systematic_pps_exactly_b_hits(spark):
    docs = [
        (hashlib.md5(f"pps:{d}".encode()).hexdigest(), d, nc)
        for d, _, nc in _docs()
    ]
    docs.sort()
    n_total = sum(nc for _, _, nc in docs)
    cum = 0
    exp = {}
    for k, d, nc in docs:
        lo, cum = cum, cum + nc
        hits = (2 * B * cum + n_total - 1) // (2 * n_total) - (
            2 * B * lo + n_total - 1
        ) // (2 * n_total)
        if hits:
            exp[d] = (lo, nc, hits)
    rows = entry.queries()["q_systematic_pps"](spark, SF).collect()
    assert {r["doc_id"] for r in rows} == set(exp)
    for r in rows:
        lo, nc, hits = exp[r["doc_id"]]
        assert (r["cum_before"], r["n_chars"], r["n_hits"]) == (lo, nc, hits)
        assert r["est_num"] == hits * n_total and r["est_den"] == B * nc
    # every point lands in exactly one interval: hits sum to exactly B
    assert sum(r["n_hits"] for r in rows) == B
    # PPS actually discriminates: selection rate differs across lengths
    assert len(rows) <= B
