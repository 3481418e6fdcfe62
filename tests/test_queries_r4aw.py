"""Independent-oracle replica tests for the failure-domain batch
(q_cascade_failure / q_ttl_jitter / q_read_your_writes): a full
threshold-cascade replay with earliest-majority-round proof, expiry
histograms under both TTL policies, and the gap-ledger staleness
replay."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_cascade_failure_matches_replica(spark):
    edges = [
        (i, j)
        for i in range(64)
        for j in range(64)
        if j // 8 == i // 8 + 1 and _md5(f"e:{i}-{j}")[0] < "6"
    ]
    preds = defaultdict(list)
    for i, j in edges:
        preds[j].append(i)
    failed = {t: (t < 8 and _md5(f"f0:{t}")[0] < "4") for t in range(64)}
    fail_round = {t: (0 if failed[t] else None) for t in range(64)}
    for r in range(1, 8):
        prev = dict(failed)
        for t in range(64):
            if prev[t] or not preds[t]:
                continue
            nf = sum(1 for p in preds[t] if prev[p])
            if 2 * nf >= len(preds[t]):
                failed[t] = True
                fail_round[t] = r
        # monotone: failures only grow
        assert all(failed[t] or not prev[t] for t in range(64))
    got = {r["task"]: r for r in entry.queries()["q_cascade_failure"](spark, SF).collect()}
    assert set(got) == set(range(64))
    n_failed = sum(1 for t in range(64) if failed[t])
    for t in range(64):
        r = got[t]
        assert r["layer"] == t // 8
        assert r["failed"] == (1 if failed[t] else 0)
        assert r["fail_round"] == fail_round[t]
        assert (r["n_failed"], r["n_tasks"]) == (n_failed, 64)
    # the seeds really seeded and the cascade reached beyond layer 0
    assert any(fail_round[t] == 0 for t in range(8))
    assert math.isclose(
        got[0]["blast_radius"], round(n_failed / 64, 6), abs_tol=1e-9
    )


def test_ttl_jitter_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    hists = {"fixed": Counter(), "jittered": Counter()}
    for eid, born in rows:
        jit = int(_md5(f"j:{eid}")[:3], 16) % 600
        hists["fixed"][(born + 3600) // 60] += 1
        hists["jittered"][(born + 3600 + jit) // 60] += 1
    got = {r["policy"]: r for r in entry.queries()["q_ttl_jitter"](spark, SF).collect()}
    assert set(got) == {"fixed", "jittered"}
    for policy, h in hists.items():
        counts = sorted(h.values())
        n_min = len(counts)
        p99 = next(
            c for j, c in enumerate(counts, 1) if 100 * j >= 99 * n_min
        )
        r = got[policy]
        assert (r["n_entries"], r["n_minutes"]) == (len(rows), n_min)
        assert r["max_per_min"] == max(counts)
        assert r["p99_per_min"] == p99
        assert math.isclose(
            r["mean_per_min"], round(len(rows) / n_min, 6), abs_tol=1e-6
        )
    # the whole argument: jitter spreads minutes and caps the worst minute
    assert got["jittered"]["n_minutes"] >= got["fixed"]["n_minutes"]
    assert got["jittered"]["max_per_min"] <= got["fixed"]["max_per_min"]


def test_read_your_writes_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT), event_id "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for u, s, e in rows:
        per[u].append((s, e))
    gaps = []
    for u, ops in per.items():
        ops.sort()
        for (s1, _e1), (s2, _e2) in zip(ops, ops[1:]):
            gaps.append((u, s2 - s1))
    got = {r["replica_lag_s"]: r for r in entry.queries()["q_read_your_writes"](spark, SF).collect()}
    assert set(got) == {1, 10, 60}
    prev_v = None
    for lag in (1, 10, 60):
        viol = [(u, g) for u, g in gaps if g < lag]
        r = got[lag]
        assert r["n_pairs"] == len(gaps)
        assert r["n_violations"] == len(viol)
        assert r["n_users_affected"] == len({u for u, _g in viol})
        assert math.isclose(
            r["violation_rate"], round(len(viol) / len(gaps), 6), abs_tol=1e-9
        )
        # monotone in lag: a slower replica breaks more sessions
        if prev_v is not None:
            assert r["n_violations"] >= prev_v
        prev_v = r["n_violations"]
