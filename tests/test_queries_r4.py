"""Independent-oracle property tests for the round-4 operator batch:
straight-line Python replicas (computed from the raw parquet fixtures, no
Spark/DuckDB shared code paths) of t-closeness, Matryoshka truncation
recall, link prediction, pass@k, and seasonal-naive MASE, plus each
operator's structural invariants."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entry.queries()[name](spark, SF)


def test_t_closeness_matches_python_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, lang, source, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    base = [
        ((lang, source, n_chars // 64), doc_id % 5)
        for doc_id, lang, source, n_chars in docs
    ]
    N = len(base)
    glob = Counter(v for _g, v in base)
    groups = defaultdict(Counter)
    for g, v in base:
        groups[g][v] += 1
    got = {
        (r["lang"], r["source"], r["len_band"]): r
        for r in _q(spark, "q_t_closeness").collect()
    }
    assert len(got) == len(groups)
    for g, cnt in groups.items():
        n_g = sum(cnt.values())
        num = sum(abs(cnt.get(v, 0) * N - glob[v] * n_g) for v in range(5))
        r = got[g]
        assert r["k"] == n_g
        assert r["tvd_num"] == num
        assert r["tvd_den"] == 2 * N * n_g
        assert abs(r["t_closeness"] - num / (2 * N * n_g)) < 2e-6
        # TVD is a distance: bounded in [0, 1]
        assert 0 <= r["t_closeness"] <= 1


def test_matryoshka_recall_invariants(spark):
    rows = {r["dims"]: r for r in _q(spark, "q_matryoshka_recall").collect()}
    assert set(rows) == {8, 16, 32, 64}
    n_exact = {r["n_exact"] for r in rows.values()}
    assert len(n_exact) == 1
    ne = n_exact.pop()
    assert ne > 0
    # full-width scoring IS the exact baseline
    assert rows[64]["hits"] == ne
    for d, r in rows.items():
        assert 0 <= r["hits"] <= ne, d
    # truncating to 8 of 64 dims cannot beat full-width
    assert rows[8]["hits"] <= rows[64]["hits"]


def _graph_edges(spark):
    from cliner_spark.queries_r2 import _docpair_edges

    return {(r["src"], r["dst"]) for r in _docpair_edges(spark, SF).collect()}


def test_link_prediction_matches_python_replica(spark):
    edges = _graph_edges(spark)
    und = edges | {(b, a) for a, b in edges}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
    deg = {n: len(vs) for n, vs in adj.items()}
    cand = defaultdict(lambda: [0, 0])  # (u,w) -> [cn, ra_micro]
    for u in adj:
        for z in adj[u]:
            for w in adj[z]:
                if u < w:
                    cand[(u, w)][0] += 1
                    cand[(u, w)][1] += 1000000 // deg[z]
    scored = []
    for (u, w), (cn, ra) in cand.items():
        if (u, w) in edges:
            continue
        scored.append((u, w, cn, ra, deg[u], deg[w]))
    want_top = {}
    by_u = defaultdict(list)
    for u, w, cn, ra, du, dw in scored:
        by_u[u].append((-cn, -ra, w, dw, du))
    for u, lst in by_u.items():
        for rn, (ncn, nra, w, dw, du) in enumerate(sorted(lst)[:3], 1):
            want_top[(u, w)] = (-ncn, -nra, rn, du, dw)
    got = {(r["u"], r["w"]): r for r in _q(spark, "q_link_prediction").collect()}
    assert set(got) == set(want_top)
    for (u, w), r in got.items():
        cn, ra, rn, du, dw = want_top[(u, w)]
        assert (r["common_neighbors"], r["ra_micro"], r["rn"]) == (cn, ra, rn)
        assert r["pref_attach"] == du * dw
        assert abs(r["jaccard"] - cn / (du + dw - cn)) < 2e-6
        # predicted pairs are NON-edges sharing >= 1 neighbor
        assert (u, w) not in edges and cn >= 1


def test_pass_at_k_matches_comb_replica(spark):
    ev = duckdb.sql(
        f"SELECT user_id, value FROM read_parquet('{SF}/events.parquet') "
        f"WHERE event_type = 'click'"
    ).fetchall()
    stats = defaultdict(lambda: [0, 0])
    for uid, v in ev:
        stats[uid][0] += 1
        stats[uid][1] += 1 if v >= 50 else 0
    want = {u: (n, c) for u, (n, c) in stats.items() if n >= 10}
    got = {r["user_id"]: r for r in _q(spark, "q_pass_at_k").collect()}
    assert set(got) == set(want)
    for u, (n, c) in want.items():
        r = got[u]
        assert (r["n_trials"], r["n_success"]) == (n, c)
        for k in (1, 5, 10):
            if n - c < k:
                exp = 1.0
            else:
                exp = 1.0 - math.comb(n - c, k) / math.comb(n, k)
            assert abs(r[f"pass_at_{k}"] - exp) < 2e-6, (u, k)
        # more attempts can only help: pass@1 <= pass@5 <= pass@10
        assert r["pass_at_1"] <= r["pass_at_5"] <= r["pass_at_10"]


def test_seasonal_naive_mase_matches_python_replica(spark):
    ev = duckdb.sql(
        f"SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    cnt = Counter(ev)
    byt = defaultdict(dict)
    for (t, h), n in cnt.items():
        byt[t][h] = n
    got = {r["event_type"]: r for r in _q(spark, "q_seasonal_naive_mase").collect()}
    for t, hours in byt.items():
        seas = [(abs(hours[h] - hours[h - 24])) for h in hours if h - 24 in hours]
        naiv = [(abs(hours[h] - hours[h - 1])) for h in hours if h - 1 in hours]
        if not seas or not naiv or t not in got:
            assert t not in got  # inner joins drop types without both lags
            continue
        r = got[t]
        assert r["n_hours"] == len(hours)
        assert (r["seasonal_pairs"], r["seasonal_abs_err"]) == (
            len(seas), sum(seas),
        )
        assert (r["naive_pairs"], r["naive_abs_err"]) == (len(naiv), sum(naiv))
        exp = (sum(seas) / len(seas)) / (sum(naiv) / len(naiv))
        assert abs(r["mase"] - exp) < 2e-6
