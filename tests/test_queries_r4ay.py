"""Independent-oracle replica tests for the interaction-dynamics batch
(q_reciprocity / q_burstiness_memory / q_group_commit): dyad-census
conservation, Goh-Barabási statistics rebuilt from raw gaps, and the
group-commit wait/batch accounting."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_reciprocity_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT), event_id "
        f"FROM read_parquet('{SF}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()
    edges = set()
    for (u1, s1, _e1), (u2, s2, _e2) in zip(rows, rows[1:]):
        if u1 != u2 and s2 - s1 <= 60:
            edges.add((u1, u2))
    nodes = {n for e in edges for n in e}
    recip = sum(1 for s, d in edges if (d, s) in edges)
    r = entry.queries()["q_reciprocity"](spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert (r["n_nodes"], r["n_edges"]) == (len(nodes), len(edges))
    assert r["n_recip_edges"] == recip
    assert r["n_mutual_pairs"] == recip // 2
    assert r["n_asym_pairs"] == len(edges) - recip
    n = len(nodes)
    # census conservation: M + A + N == C(n, 2)
    assert r["n_mutual_pairs"] + r["n_asym_pairs"] + r["n_null_dyads"] == (
        n * (n - 1) // 2
    )
    assert math.isclose(
        r["reciprocity"], round(recip / len(edges), 6), abs_tol=1e-9
    )


def test_burstiness_memory_matches_replica(spark):
    # Replica orders by (event_type, floor-epoch sec, event_id) while the
    # query's window orders by (ts, event_id). These can permute events
    # that share a second — but the gap sequence is INVARIANT under any
    # permutation within equal seconds (intra-second gaps are 0 and the
    # sec sequence itself is unchanged), so the sufficient statistics
    # compared below are identical under both orders.
    rows = duckdb.sql(
        f"SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT), event_id "
        f"FROM read_parquet('{SF}/events.parquet') ORDER BY event_type, 2, 3"
    ).fetchall()
    per = defaultdict(list)
    for et, s, _e in rows:
        per[et].append(s)
    got = {r["event_type"]: r for r in entry.queries()["q_burstiness_memory"](spark, SF).collect()}
    assert set(got) == set(per)
    for et, secs in per.items():
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        n = len(gaps)
        sx, sxx = sum(gaps), sum(g * g for g in gaps)
        mu = sx / n
        sig = math.sqrt(sxx / n - mu * mu)
        b = (sig - mu) / (sig + mu)
        pairs = list(zip(gaps, gaps[1:]))
        np_ = len(pairs)
        px = sum(x for x, _y in pairs)
        py = sum(y for _x, y in pairs)
        pxy = sum(x * y for x, y in pairs)
        pxx = sum(x * x for x, _y in pairs)
        pyy = sum(y * y for _x, y in pairs)
        m = (np_ * pxy - px * py) / math.sqrt(
            (np_ * pxx - px * px) * (np_ * pyy - py * py)
        )
        r = got[et]
        assert (r["n_gaps"], r["sx"], r["sxx"]) == (n, sx, sxx)
        assert r["n_pairs"] == np_
        assert r["mem_num"] == np_ * pxy - px * py
        assert math.isclose(r["burstiness_b"], round(b, 6), abs_tol=2e-6)
        assert math.isclose(r["memory_m"], round(m, 6), abs_tol=2e-6)
        # definition bounds
        assert -1 <= r["burstiness_b"] <= 1
        assert -1 <= r["memory_m"] <= 1


def test_group_commit_matches_replica(spark):
    tms = [
        t for (t,) in duckdb.sql(
            f"SELECT CAST(epoch_us(ts) // 1000 AS BIGINT) "
            f"FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    got = {r["interval_ms"]: r for r in entry.queries()["q_group_commit"](spark, SF).collect()}
    assert set(got) == {1, 10, 100}
    prev_fsyncs = None
    for iv in (1, 10, 100):
        batches = {t // iv for t in tms}
        waits = [iv - (t % iv) for t in tms]
        r = got[iv]
        assert (r["n_txn"], r["n_fsyncs"]) == (len(tms), len(batches))
        assert r["total_wait_ms"] == sum(waits)
        assert r["max_wait_ms"] == max(waits)
        assert math.isclose(
            r["batch_factor"], round(len(tms) / len(batches), 6), abs_tol=1e-6
        )
        assert math.isclose(
            r["avg_wait_ms"], round(sum(waits) / len(tms), 6), abs_tol=1e-6
        )
        # the trade: longer intervals -> fewer fsyncs, more waiting
        if prev_fsyncs is not None:
            assert r["n_fsyncs"] <= prev_fsyncs
        prev_fsyncs = r["n_fsyncs"]
    assert got[100]["total_wait_ms"] > got[1]["total_wait_ms"]
