"""Independent-oracle replica tests for the interval/sketch/seasonality
batch (q_interval_overlap / q_ams_f2 / q_dow_seasonality), incl. a
brute-force no-bucketing interval join, the AMS unbiasedness shape, and
the full between/within variance reconstruction."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import date, datetime, timedelta
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_interval_overlap_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(ts AS DATE), min(ts), max(ts) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    d0 = min(r[1] for r in rows)
    d1 = max(r[1] for r in rows)
    nd = (d1 - d0).days
    t0 = datetime.combine(d0, datetime.min.time())
    wins = {
        k: (
            t0 + timedelta(days=7 * k, hours=12),
            t0 + timedelta(days=7 * k, hours=48),
        )
        for k in range(nd // 7 + 1)
    }
    exp = {
        k: dict(cand=0, ov=0, sec=0, cont=0, mx=0) for k in wins
    }
    # brute force: every interval against every window (no bucketing),
    # then intersect with the bucket-candidacy rule for cand counting
    for _u, day, a_s, a_e in rows:
        for k, (w_s, w_e) in wins.items():
            if not (w_s.date() <= day <= w_e.date()):
                continue  # would never share a day bucket
            e = exp[k]
            e["cand"] += 1
            if a_s <= w_e and w_s <= a_e:
                # engines count second-BOUNDARY crossings (floor each
                # endpoint), not the truncated exact difference
                lo = max(a_s, w_s).replace(microsecond=0)
                hi = min(a_e, w_e).replace(microsecond=0)
                sec = max(0, int((hi - lo).total_seconds()))
                if sec > 0:
                    e["ov"] += 1
                e["sec"] += sec
                e["mx"] = max(e["mx"], sec)
            if a_s >= w_s and a_e <= w_e:
                e["cont"] += 1
    got = {r["win_id"]: r for r in entry.queries()["q_interval_overlap"](spark, SF).collect()}
    assert set(got) == set(wins)
    for k, e in exp.items():
        r = got[k]
        assert r["n_candidates"] == e["cand"], k
        assert (r["n_overlapping"], r["overlap_seconds"]) == (e["ov"], e["sec"])
        assert (r["n_contained"], r["max_overlap_s"]) == (e["cont"], e["mx"])
        # bucketing is lossless: an overlapping pair always shares a day
        assert r["n_overlapping"] <= r["n_candidates"]


def test_ams_f2_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT coalesce(text, '') FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    bg = Counter()
    for (text,) in docs:
        toks = [t.lower() for t in text.split()]
        for a, b in zip(toks, toks[1:]):
            bg[f"{a} {b}"] += 1
    f2 = sum(f * f for f in bg.values())
    ys = {}
    for j in range(1, 17):
        y = 0
        for g, f in bg.items():
            h = hashlib.md5(f"{j}#{g}".encode()).hexdigest()[0]
            y += f if h < "8" else -f
        ys[j] = y
    xs = sorted(((y * y, j) for j, y in ys.items()))
    med = xs[7][0]
    got = {r["j"]: r for r in entry.queries()["q_ams_f2"](spark, SF).collect()}
    assert set(got) == set(range(1, 17))
    for j in range(1, 17):
        r = got[j]
        assert (r["y"], r["x"], r["f2"]) == (ys[j], ys[j] ** 2, f2)
        assert r["abs_err"] == abs(ys[j] ** 2 - f2)
        assert r["med_x"] == med
        assert math.isclose(
            r["med_rel_err"], round(abs(med - f2) / f2, 6), abs_tol=1e-9
        )
    # the median-of-16 must be a decent estimate on this vector (the AMS
    # guarantee is distributional; this fixture sits well inside it)
    assert abs(med - f2) / f2 < 1.0


def test_dow_seasonality_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), count(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).fetchall()
    days = dict(rows)
    d0, d1 = min(days), max(days)
    series = []
    d = d0
    while d <= d1:
        # python: Monday=0 ... Sunday=6; Spark: Sunday=1 ... Saturday=7
        dow = (d.weekday() + 1) % 7 + 1
        series.append((dow, days.get(d, 0)))
        d += timedelta(days=1)
    n_all = len(series)
    s_all = sum(x for _d, x in series)
    grp = defaultdict(lambda: [0, 0])
    for dow, x in series:
        grp[dow][0] += 1
        grp[dow][1] += x
    got = {r["dow"]: r for r in entry.queries()["q_dow_seasonality"](spark, SF).collect()}
    assert set(got) == set(grp)
    ranks = sorted(
        grp, key=lambda w: (-Fraction(grp[w][1], grp[w][0]), w)
    )
    between = Fraction(0)
    gmean = Fraction(s_all, n_all)
    for dow, (n_d, s_d) in grp.items():
        r = got[dow]
        assert (r["n_d"], r["s_d"]) == (n_d, s_d)
        assert (r["dev_num"], r["dev_den"]) == (
            s_d * n_all - s_all * n_d, n_d * n_all,
        )
        assert (r["n_all"], r["s_all"]) == (n_all, s_all)
        assert r["peak_rank"] == ranks.index(dow) + 1
        between += n_d * (Fraction(s_d, n_d) - gmean) ** 2
    # rebuild the variance decomposition from the shipped ledger: the
    # between-group sum of squares must be nonnegative and bounded by total
    total_ss = sum((Fraction(x) - gmean) ** 2 for _d, x in series)
    assert 0 <= between <= total_ss
