"""Independent-oracle replica tests for the bipartite/serving/parametric
batch (q_butterfly_count / q_nucleus_audit / q_ols_trend), incl. a direct
4-cycle enumeration cross-check, nucleus minimality, and a Fractions OLS."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_butterfly_count_matches_replica(spark):
    docs = _docs()
    bt = defaultdict(set)
    for did, text in docs:
        for t in text.split():
            bt[t.lower()].add(did)
    kept = {t: ds for t, ds in bt.items() if len(ds) <= 50}
    wedges = sum(len(ds) * (len(ds) - 1) // 2 for ds in kept.values())
    n_edges = sum(len(ds) for ds in kept.values())
    common = Counter()
    for ds in kept.values():
        ss = sorted(ds)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                common[(ss[i], ss[j])] += 1
    butterflies = sum(c * (c - 1) // 2 for c in common.values())
    r = entry.queries()["q_butterfly_count"](spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert (r["n_edges"], r["n_tokens_used"]) == (n_edges, len(kept))
    assert (r["wedges"], r["n_doc_pairs"]) == (wedges, len(common))
    assert r["butterflies"] == butterflies
    assert r["max_common"] == max(common.values())
    assert math.isclose(
        r["butterfly_density"], round(butterflies / wedges, 6), abs_tol=1e-9
    )
    # identity check on a tiny direct enumeration: butterflies over the 5
    # lowest-id docs counted by brute-force 4-cycle scan must agree
    sub = sorted({d for _t, ds in kept.items() for d in ds})[:5]
    toks_of = {d: {t for t, ds in kept.items() if d in ds} for d in sub}
    direct = 0
    for i in range(len(sub)):
        for j in range(i + 1, len(sub)):
            c = len(toks_of[sub[i]] & toks_of[sub[j]])
            direct += c * (c - 1) // 2
    expect = sum(
        c * (c - 1) // 2
        for (u, v), c in common.items()
        if u in sub and v in sub
    )
    assert direct == expect


def test_nucleus_audit_matches_replica(spark):
    docs = _docs()
    uni = Counter()
    big = defaultdict(Counter)
    for _did, text in docs:
        toks = [t.lower() for t in text.split()]
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[a][b] += 1
    contexts = sorted(uni, key=lambda t: (-uni[t], t))[:8]
    got = {r["context"]: r for r in entry.queries()["q_nucleus_audit"](spark, SF).collect()}
    assert set(got) == set(contexts)
    for cx in contexts:
        succ = sorted(big[cx].items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(c for _t, c in succ)
        cum = 0
        nucleus = None
        for i, (_t, c) in enumerate(succ, 1):
            cum += c
            if 10 * cum >= 9 * total:
                nucleus = i
                break
        top5 = sum(c for _t, c in succ[:5])
        r = got[cx]
        assert (r["n_successors"], r["total"]) == (len(succ), total)
        assert (r["greedy_token"], r["greedy_count"]) == succ[0]
        assert r["nucleus_size_p90"] == nucleus
        assert r["top5_mass"] == top5
        assert math.isclose(r["top5_rate"], round(top5 / total, 6), abs_tol=1e-9)
        # minimality: one fewer rank must NOT reach 90%
        if nucleus > 1:
            cum_prev = sum(c for _t, c in succ[: nucleus - 1])
            assert 10 * cum_prev < 9 * total


def test_ols_trend_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), count(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    per = defaultdict(dict)
    for et, d, c in rows:
        per[et][(d - date(1970, 1, 1)).days] = c
    got = {r["event_type"]: r for r in entry.queries()["q_ols_trend"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, days in per.items():
        d0, d1 = min(days), max(days)
        xs = [days.get(d, 0) for d in range(d0, d1 + 1)]
        n = len(xs)
        st = n * (n - 1) // 2
        sx = sum(xs)
        stt = sum(t * t for t in range(n))
        stx = sum(t * x for t, x in enumerate(xs))
        sxx = sum(x * x for x in xs)
        b_num, b_den = n * stx - st * sx, n * stt - st * st
        b = Fraction(b_num, b_den)
        a = Fraction(sx * b_den - b_num * st, n * b_den)
        r = got[et]
        assert (r["n_days"], r["slope_num"], r["slope_den"]) == (n, b_num, b_den)
        assert Fraction(r["icept_num"], r["icept_den"]) == a
        assert math.isclose(r["slope"], round(float(b), 6), abs_tol=2e-6)
        # exact residuals in Fractions; signs must match the integer ledger
        resid = [Fraction(x) - a - b * t for t, x in enumerate(xs)]
        same = flip = 0
        for p, q in zip(resid, resid[1:]):
            sp = (p > 0) - (p < 0)
            sq = (q > 0) - (q < 0)
            if sp * sq == 1:
                same += 1
            elif sp * sq == -1:
                flip += 1
        assert (r["n_same_sign"], r["n_flip_sign"]) == (same, flip)
        # R^2 from the same sufficient stats
        r2 = Fraction(b_num * b_num, b_den * (n * sxx - sx * sx))
        assert math.isclose(r["r2"], float(r2), abs_tol=2e-6)
        assert 0 <= r["r2"] <= 1
        # OLS residuals sum to zero exactly -> signs cannot all agree
        assert sum(resid) == 0
