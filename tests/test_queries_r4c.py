"""Independent-oracle property tests for the round-4n batch: straight-line
Python replicas (raw parquet via DuckDB fetch, no Spark/DuckDB shared SQL)
of the funnel conversion ledger, retention cohort matrix, chi-square /
Cramér's V audit, Mann-Kendall + Theil-Sen trend row, and the EWMA anomaly
ledger, plus structural invariants."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entry.queries()[name](spark, SF)


def _events():
    return duckdb.sql(
        f"SELECT user_id, event_type, ts FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()


def _daily():
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE) AS d, count(*) FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).fetchall()
    import datetime

    cnt = {d: n for d, n in rows}
    dmin, dmax = min(cnt), max(cnt)
    days = []
    d = dmin
    while d <= dmax:
        days.append(cnt.get(d, 0))
        d += datetime.timedelta(days=1)
    return days


def test_funnel_matches_replica(spark):
    ev = _events()
    t1, t2, t3 = {}, {}, {}
    for u, et, ts in ev:
        if et == "signup" and (u not in t1 or ts < t1[u]):
            t1[u] = ts
    for u, et, ts in ev:
        if et == "click" and u in t1 and ts > t1[u] and (
            u not in t2 or ts < t2[u]
        ):
            t2[u] = ts
    for u, et, ts in ev:
        if et == "purchase" and u in t2 and ts > t2[u] and (
            u not in t3 or ts < t3[u]
        ):
            t3[u] = ts
    got = {
        r["step"]: r
        for r in (
            x.asDict() for x in _q(spark, "q_funnel_conversion").collect()
        )
    }
    assert got[1]["n_users"] == len(t1)
    assert got[2]["n_users"] == len(t2)
    assert got[3]["n_users"] == len(t3)
    # monotone funnel: each step is a subset of the previous
    assert len(t1) >= len(t2) >= len(t3)
    assert got[2]["prev_users"] == len(t1)
    assert got[3]["first_users"] == len(t1)
    # fixture is non-vacuous: some users convert through all three steps
    assert len(t3) > 0


def test_retention_matches_replica(spark):
    ev = _events()
    d0 = {}
    for u, _et, ts in ev:
        d = ts.date()
        if u not in d0 or d < d0[u]:
            d0[u] = d
    act = {(u, (ts.date() - d0[u]).days // 7) for u, _et, ts in ev}
    cohort_n = Counter(d0.values())
    active = Counter((d0[u], wk) for u, wk in act)
    maxwk = max(wk for _u, wk in act)
    got = {
        (r["cohort_day"], r["week_offset"]): r
        for r in (
            x.asDict() for x in _q(spark, "q_retention_cohorts").collect()
        )
    }
    # full zero-filled grid
    assert len(got) == len(cohort_n) * (maxwk + 1)
    for (cd, wk), r in got.items():
        d = __import__("datetime").date.fromisoformat(cd)
        assert r["cohort_users"] == cohort_n[d]
        assert r["active_users"] == active.get((d, wk), 0)
    # week 0 retention is always 1.0 (a user is active in their own week 0)
    for (cd, wk), r in got.items():
        if wk == 0:
            assert r["active_users"] == r["cohort_users"]


def test_chisq_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT source, lang, count(*) FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    obs = {(s, l): n for s, l, n in rows}
    rtot = Counter()
    ctot = Counter()
    for (s, l), n in obs.items():
        rtot[s] += n
        ctot[l] += n
    nn = sum(obs.values())
    chi2 = 0.0
    for s in rtot:
        for l in ctot:
            o = obs.get((s, l), 0)
            e = rtot[s] * ctot[l] / nn
            chi2 += (o - e) ** 2 / e
    got = [x.asDict() for x in _q(spark, "q_chisq_independence").collect()]
    assert len(got) == len(rtot) * len(ctot)
    for r in got:
        o = obs.get((r["source"], r["lang"]), 0)
        assert r["obs"] == o
        assert r["chisq_num"] == (nn * o - rtot[r["source"]] * ctot[r["lang"]]) ** 2
        assert r["chisq_den"] == nn * rtot[r["source"]] * ctot[r["lang"]]
        assert abs(r["chi2"] - chi2) < 1e-4
        v = math.sqrt(chi2 / (nn * min(len(rtot) - 1, len(ctot) - 1)))
        assert abs(r["cramers_v"] - v) < 1e-4


def test_mann_kendall_matches_replica(spark):
    days = _daily()
    n = len(days)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = days[j] - days[i]
            s += (d > 0) - (d < 0)
            slopes.append(((days[j] - days[i]) * 1000 // (j - i), i + 1, j + 1))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1][0]
    ties = Counter(days)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    r = _q(spark, "q_mann_kendall").collect()[0].asDict()
    assert r["n_days"] == n
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["s_stat"] == s
    assert r["var18"] == var18
    assert r["ts_slope_milli"] == med
    # variance is positive whenever the series is not all-constant
    assert var18 > 0


def test_ewma_matches_replica(spark):
    days = _daily()
    got = {
        r["day"]: r
        for r in (x.asDict() for x in _q(spark, "q_ewma_anomaly").collect())
    }
    # first day has no prior history -> exactly n-1 rows
    assert len(got) == len(days) - 1
    import datetime

    rows = duckdb.sql(
        f"SELECT min(CAST(ts AS DATE)) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()
    dmin = rows[0]
    n_flagged = 0
    for idx in range(1, len(days)):
        day = dmin + datetime.timedelta(days=idx)
        num = den = 0
        for o in range(1, 17):
            if idx - o < 0:
                continue
            w = 1 << (16 - o)
            num += w * days[idx - o]
            den += w
        r = got[str(day)]
        assert r["x"] == days[idx]
        assert r["ewma_num"] == num
        assert r["ewma_den"] == den
        assert r["flag_high"] == (days[idx] * den > 2 * num)
        assert r["flag_low"] == (2 * days[idx] * den < num)
        n_flagged += r["flag_high"] or r["flag_low"]
    # once >=16 days of history exist the weight ladder is complete:
    # den = 2^15 + ... + 2^0 = 2^16 - 1
    if len(days) > 16:
        last = str(dmin + datetime.timedelta(days=len(days) - 1))
        assert got[last]["ewma_den"] == (1 << 16) - 1
