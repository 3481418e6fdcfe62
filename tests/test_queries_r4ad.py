"""Independent-oracle replica tests for the nonparametric trend/rank batch
(q_theil_sen / q_kruskal_wallis / q_acf), incl. a Fractions-exact ACF, the
KW rank identity sum(r2) = N(N+1), and full-H reconstruction from the
per-group ledger."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _daily(by_type=False):
    col = "event_type, " if by_type else ""
    rows = duckdb.sql(
        f"SELECT {col}CAST(ts AS DATE), count(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY ALL"
    ).fetchall()
    return rows


def test_theil_sen_matches_replica(spark):
    per = defaultdict(list)
    for et, d, c in _daily(by_type=True):
        per[et].append(((d - date(1970, 1, 1)).days, c))
    got = {r["event_type"]: r for r in entry.queries()["q_theil_sen"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, pts in per.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d1, c1 = pts[i]
                d2, c2 = pts[j]
                slopes.append((Fraction(c2 - c1, d2 - d1), c2 - c1, d2 - d1))
        slopes.sort(key=lambda s: (s[0], s[1], s[2]))
        m = len(slopes)
        lo, hi = slopes[(m + 1) // 2 - 1], slopes[m // 2]
        r = got[et]
        assert (r["n_days"], r["n_pairs"]) == (len(pts), m)
        # the shipped rationals must equal the replica's median slopes as values
        assert Fraction(r["slope_lo_num"], r["slope_lo_den"]) == lo[0]
        assert Fraction(r["slope_hi_num"], r["slope_hi_den"]) == hi[0]
        assert lo[0] <= hi[0]
        mid = (lo[0] + hi[0]) / 2
        assert math.isclose(r["slope"], round(float(mid), 6), abs_tol=2e-6)


def test_kruskal_wallis_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    xs = sorted(x for _s, x in rows)
    n = len(xs)
    first_rank = {}
    cnt = Counter(xs)
    r = 1
    for v in sorted(cnt):
        first_rank[v] = r
        r += cnt[v]
    r2 = {v: 2 * first_rank[v] + cnt[v] - 1 for v in cnt}
    groups = defaultdict(list)
    for s, x in rows:
        groups[s].append(x)
    got = {row["source"]: row for row in entry.queries()["q_kruskal_wallis"](spark, SF).collect()}
    assert set(got) == set(groups)
    tie_sum = sum(t**3 - t for t in cnt.values())
    total_r2 = 0
    h = Fraction(0)
    for s, vals in groups.items():
        rsum = sum(r2[v] for v in vals)
        total_r2 += rsum
        row = got[s]
        assert (row["n_g"], row["r2_sum"]) == (len(vals), rsum)
        assert (row["dev_num"], row["dev_den"]) == (rsum - len(vals) * (n + 1), 2 * len(vals))
        assert (row["n_total"], row["tie_sum"]) == (n, tie_sum)
        assert row["n3_minus_n"] == n**3 - n
        contrib = Fraction(3 * rsum * rsum, n * (n + 1) * len(vals))
        assert math.isclose(row["h_contrib"], float(contrib), rel_tol=1e-9, abs_tol=1e-6)
        h += contrib
    # the mid-rank identity: doubled ranks sum to exactly N(N+1)
    assert total_r2 == n * (n + 1)
    # reconstruct H (+ tie correction) from the shipped ledger; it must be a
    # sane chi-square-scale number for k groups
    h = h - 3 * (n + 1)
    c = 1 - Fraction(tie_sum, n**3 - n)
    h_corr = h / c
    assert 0 <= float(h_corr) < 10 * len(groups)


def test_acf_matches_replica(spark):
    days = {}
    for d, c in _daily():
        days[(d - date(1970, 1, 1)).days] = c
    d0, d1 = min(days), max(days)
    xs = [days.get(d, 0) for d in range(d0, d1 + 1)]
    n, s = len(xs), sum(xs)
    dev = [n * x - s for x in xs]

    def acov(k):
        return sum(dev[t] * dev[t + k] for t in range(n - k))

    a0 = acov(0)
    got = {r["lag"]: r for r in entry.queries()["q_acf"](spark, SF).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    r_exact = {}
    for k in range(1, 6):
        ak = acov(k)
        r = got[k]
        assert (r["n_days"], r["acf_num"], r["acf_den"]) == (n, ak, a0)
        r_exact[k] = Fraction(ak, a0)
        assert math.isclose(r["acf"], float(r_exact[k]), abs_tol=2e-6)
        lb = float(n * (n + 2) * r_exact[k] ** 2 / (n - k))
        assert math.isclose(r["ljung_box_term"], lb, abs_tol=2e-6)
        assert abs(r_exact[k]) <= 1  # Cauchy-Schwarz: |r_k| <= 1
    p2 = (r_exact[2] - r_exact[1] ** 2) / (1 - r_exact[1] ** 2)
    assert math.isclose(got[2]["pacf2"], float(p2), abs_tol=2e-6)
    assert all(got[k]["pacf2"] is None for k in (1, 3, 4, 5))
