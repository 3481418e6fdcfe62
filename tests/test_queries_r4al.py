"""Independent-oracle replica tests for the governance/infra batch
(q_rate_limit_audit / q_gc_orphans / q_histogram_intersection): a
sliding-log limiter replay, the every-day-served-once GC invariant, and
the K(a,a) = 1 kernel calibration."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_rate_limit_audit_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    per_user = defaultdict(list)
    for u, s in rows:
        per_user[u].append(s)
    buckets = defaultdict(lambda: dict(users=0, ev=0, viol=0, vusers=0, peak=0))
    for u, secs in per_user.items():
        secs.sort()
        viol = 0
        peak = 0
        import bisect

        for i, s in enumerate(secs):
            lo = bisect.bisect_left(secs, s - 60)
            n60 = i - lo + 1
            peak = max(peak, n60)
            if n60 >= 5:
                viol += 1
        b = buckets[u % 16]
        b["users"] += 1
        b["ev"] += len(secs)
        b["viol"] += viol
        b["vusers"] += 1 if viol > 0 else 0
        b["peak"] = max(b["peak"], peak)
    got = {r["user_bucket"]: r for r in entry.queries()["q_rate_limit_audit"](spark, SF).collect()}
    assert set(got) == set(buckets)
    for ub, e in buckets.items():
        r = got[ub]
        assert (r["n_users"], r["n_events"]) == (e["users"], e["ev"])
        assert (r["n_violations"], r["n_users_violating"]) == (e["viol"], e["vusers"])
        assert r["peak_rate_60s"] == e["peak"]
        assert math.isclose(
            r["violation_rate"], round(e["viol"] / e["ev"], 6), abs_tol=1e-9
        )


def test_gc_orphans_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), count(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).fetchall()
    n_days = len(rows)
    rewritten = {
        d: hashlib.md5(f"rw:{d}".encode()).hexdigest()[0] < "8" for d, _n in rows
    }
    got = {r["gen"]: r for r in entry.queries()["q_gc_orphans"](spark, SF).collect()}
    assert set(got) == {1, 2}
    n_rw = sum(1 for v in rewritten.values() if v)
    rows_rw = sum(n for d, n in rows if rewritten[d])
    total = sum(n for _d, n in rows)
    g1, g2 = got[1], got[2]
    assert (g1["n_files"], g1["n_orphans"]) == (n_days, n_rw)
    assert g1["n_live"] == n_days - n_rw
    assert (g1["rows_total"], g1["rows_reclaimable"]) == (total, rows_rw)
    assert (g2["n_files"], g2["n_orphans"]) == (n_rw, 0)
    assert g2["n_live"] == n_rw
    # the serving invariant: every day has exactly one live file
    assert g1["n_live"] + g2["n_live"] == n_days
    assert math.isclose(
        g1["reclaim_frac"], round(rows_rw / total, 6), abs_tol=1e-9
    )


def test_histogram_intersection_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT source, coalesce(text, '') "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    hist = defaultdict(Counter)
    for s, text in rows:
        hist[s].update(t.lower() for t in text.split())
    got = {
        (r["src_a"], r["src_b"]): r
        for r in entry.queries()["q_histogram_intersection"](spark, SF).collect()
    }
    sources = sorted(hist)
    expected_pairs = {
        (a, b) for i, a in enumerate(sources) for b in sources[i:]
    }
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        ov = sum(min(hist[a][t], hist[b][t]) for t in hist[a])
        na, nb = sum(hist[a].values()), sum(hist[b].values())
        assert r["raw_overlap"] == ov
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["kernel_den"] == min(na, nb)
        assert math.isclose(
            r["intersection_sim"], round(ov / min(na, nb), 6), abs_tol=1e-9
        )
        # the kernel calibration: the diagonal is exactly 1
        if a == b:
            assert r["intersection_sim"] == 1.0
        else:
            assert r["intersection_sim"] <= 1.0
