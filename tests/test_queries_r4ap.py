"""Independent-oracle replica tests for the SRE/capacity batch
(q_maxmin_fairshare / q_hedged_requests / q_retry_budget): a water-level
scan with conservation proof, both survival curves with the hedged <=
single dominance, and the retry expectation check."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_maxmin_fairshare_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, count(*) FROM read_parquet('{SF}/events.parquet') "
        f"GROUP BY 1"
    ).fetchall()
    dem = sorted((d, u) for u, d in rows)
    n = len(dem)
    total = sum(d for d, _u in dem)
    c = total // 2
    p_prev = 0
    theta = None
    for j, (d, _u) in enumerate(dem, 1):
        if d * (n - j + 1) >= c - p_prev:
            theta = Fraction(c - p_prev, n - j + 1)
            break
        p_prev += d
    r = entry.queries()["q_maxmin_fairshare"](spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert (r["n_users"], r["total_demand"], r["capacity"]) == (n, total, c)
    assert Fraction(r["theta_num"], r["theta_den"]) == theta
    n_full = sum(1 for d, _u in dem if d < theta)
    full_mass = sum(d for d, _u in dem if d < theta)
    assert (r["n_full"], r["n_capped"]) == (n_full, n - n_full)
    assert r["full_mass"] == full_mass
    # water conservation: sum min(d, theta) == C exactly
    assert full_mass + (n - n_full) * theta == c
    assert r["conserves_capacity"] == 1
    # max-min optimality shape: theta below the max demand when capped
    if n - n_full > 0:
        assert theta <= max(d for d, _u in dem)


def test_hedged_requests_matches_replica(spark):
    lats = [
        int(math.floor(abs(v) * 1000))
        for (v,) in duckdb.sql(
            f"SELECT value FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    n = len(lats)
    cnt = Counter(lats)
    grid = sorted(cnt)
    got = {
        (r["mode"], r["q"]): r
        for r in entry.queries()["q_hedged_requests"](spark, SF).collect()
    }
    assert set(got) == {(m, q) for m in ("single", "hedged") for q in (50, 90, 99)}
    cum = 0
    surv = {}
    for ms in grid:
        cum += cnt[ms]
        surv[ms] = n - cum
    for q in (50, 90, 99):
        lat_s = min(ms for ms in grid if 100 * surv[ms] <= (100 - q) * n)
        lat_h = min(
            ms for ms in grid if 100 * surv[ms] ** 2 <= (100 - q) * n * n
        )
        rs, rh = got[("single", q)], got[("hedged", q)]
        assert rs["latency_ms"] == lat_s
        assert rh["latency_ms"] == lat_h
        assert rs["survivors_at"] == surv[lat_s]
        assert rh["survivors_at"] == surv[lat_h]
        assert (rs["n"], rh["n"]) == (n, n)
        assert (rs["request_load"], rh["request_load"]) == (1.0, 2.0)
        # the tail-at-scale claim: hedging never worsens a quantile
        assert lat_h <= lat_s
    # and it genuinely helps deep in the tail on any nondegenerate curve
    assert got[("hedged", 99)]["latency_ms"] <= got[("single", 99)]["latency_ms"]


def test_retry_budget_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT event_type, event_id FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    per = {}
    for et, eid in rows:
        a = [_md5(f"try:{eid}:{k}")[0] < "c" for k in (1, 2, 3)]
        e = per.setdefault(et, dict(n=0, o1=0, o2=0, o3=0, att=0))
        e["n"] += 1
        e["o1"] += a[0]
        e["o2"] += a[0] or a[1]
        e["o3"] += a[0] or a[1] or a[2]
        e["att"] += 1 if a[0] else (2 if a[1] else 3)
    got = {r["event_type"]: r for r in entry.queries()["q_retry_budget"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, e in per.items():
        r = got[et]
        assert (r["n_requests"], r["ok_by_1"], r["ok_by_2"], r["ok_by_3"]) == (
            e["n"], e["o1"], e["o2"], e["o3"],
        )
        assert r["exhausted"] == e["n"] - e["o3"]
        assert r["total_attempts"] == e["att"]
        assert math.isclose(
            r["amplification"], round(e["att"] / e["n"], 6), abs_tol=1e-9
        )
        # E[attempts] = 1 + q + q^2 = 1.3125 at q = 1/4; md5 coins must land
        # near it
        assert 1.2 < r["amplification"] < 1.45
        assert r["failure_rate"] < 0.06
