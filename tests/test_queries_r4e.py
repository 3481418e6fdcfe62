"""Independent-oracle property tests for the round-4p batch: a true
pool-adjacent-violators replica for the isotonic fit, a pairwise-loop
Kendall tau-b, a straight-line RBO, and a McNemar 2x2 replica."""

from __future__ import annotations

import datetime
import math
from collections import Counter

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entry.queries()[name](spark, SF)


def test_isotonic_is_pav_of_calibration_bins(spark):
    # inputs = the per-bin (n, n_pos) of q_calibration_bins (itself
    # hash-verified against DuckDB every round); PAV replica = classic
    # stack-based pooling
    bins = sorted(
        (r["bin"], r["n"], r["n_pos"])
        for r in (
            x.asDict() for x in _q(spark, "q_calibration_bins").collect()
        )
    )
    stack = []  # (pos_sum, n_sum)
    for _b, n, p in bins:
        cur = (p, n)
        while stack and stack[-1][0] * cur[1] >= cur[0] * stack[-1][1]:
            top = stack.pop()
            cur = (cur[0] + top[0], cur[1] + top[1])
        stack.append(cur)
    # expand: each pooled block covers as many bins as its n-sum built from
    rates = []
    idx = 0
    for p, n in stack:
        covered = 0
        acc_n = 0
        while acc_n < n:
            acc_n += bins[idx][1]
            idx += 1
            covered += 1
        rates.extend([(p, n)] * covered)
    got = sorted(
        (r["bin"], r)
        for r in (
            x.asDict()
            for x in _q(spark, "q_isotonic_calibration").collect()
        )
    )
    assert len(got) == len(bins)
    prev = -1.0
    for (bin_id, r), (_b2, _n, _p), (pp, nn) in zip(got, bins, rates):
        assert r["iso_num"] * nn == pp * r["iso_den"], (
            bin_id,
            r["iso_num"],
            r["iso_den"],
            pp,
            nn,
        )
        # monotone non-decreasing fit
        rate = r["iso_num"] / r["iso_den"]
        assert rate >= prev - 1e-12
        prev = rate


def test_kendall_taub_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), count(*), "
        f"sum(CAST(round(value * 100) AS BIGINT)) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).fetchall()
    cnt = {d: (x, y) for d, x, y in rows}
    dmin, dmax = min(cnt), max(cnt)
    series = []
    d = dmin
    while d <= dmax:
        series.append(cnt.get(d, (0, 0)))
        d += datetime.timedelta(days=1)
    C = D = TX = TY = TXY = 0
    n = len(series)
    for i in range(n):
        for j in range(i + 1, n):
            dx = series[j][0] - series[i][0]
            dy = series[j][1] - series[i][1]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            elif dx == 0 and dy == 0:
                TXY += 1
            elif dx == 0:
                TX += 1
            else:
                TY += 1
    r = _q(spark, "q_kendall_taub").collect()[0].asDict()
    assert (r["n_con"], r["n_dis"]) == (C, D)
    assert (r["ties_x"], r["ties_y"], r["ties_xy"]) == (TX, TY, TXY)
    assert r["tau_num"] == C - D
    tau = (C - D) / math.sqrt((C + D + TX) * (C + D + TY))
    assert abs(r["tau_b"] - tau) < 1e-6
    # all pairs accounted for
    assert C + D + TX + TY + TXY == n * (n - 1) // 2


def test_rbo_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    byc = sorted(docs, key=lambda r: (-r[2], r[0]))
    byt = sorted(docs, key=lambda r: (-len((r[1] or "").split()), r[0]))
    ra = {r[0]: i + 1 for i, r in enumerate(byc)}
    rb = {r[0]: i + 1 for i, r in enumerate(byt)}
    got = {
        r["depth"]: r
        for r in (x.asDict() for x in _q(spark, "q_rbo_topk").collect())
    }
    assert set(got) == set(range(1, 21))
    run = 0.0
    for d in range(1, 21):
        o = sum(1 for k in ra if ra[k] <= d and rb[k] <= d)
        r = got[d]
        assert r["overlap"] == o
        assert r["term_num"] == o
        assert r["term_den"] == d * (1 << d)
        run += o / (d * (1 << d))
        assert abs(r["rbo_min"] - run) < 1e-5
    # identical rankings would give overlap == depth everywhere; the two
    # proxies differ, so RBO is strictly below the 1-sum at depth 20
    assert got[20]["rbo_min"] <= sum(
        1 / (1 << dd) for dd in range(1, 21)
    ) + 1e-9


def test_mcnemar_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    a = b = c = d = 0
    for _id, text, n_chars in docs:
        toks = [t.lower() for t in (text or "").split()]
        if not toks:
            continue
        g1 = (1000 * len(set(toks))) // len(toks) >= 500
        g2 = n_chars >= 200
        a += g1 and g2
        b += g1 and not g2
        c += (not g1) and g2
        d += (not g1) and (not g2)
    r = _q(spark, "q_mcnemar_gates").collect()[0].asDict()
    assert (r["both_pass"], r["only_g1"], r["only_g2"], r["neither"]) == (
        a,
        b,
        c,
        d,
    )
    assert r["mcnemar_num"] == (b - c) ** 2
    assert r["mcnemar_den"] == b + c
    assert r["odds_num"] == a * d and r["odds_den"] == b * c
    # discordant cells exist on the fixture (the test is non-vacuous)
    assert b + c > 0
