"""Independent-oracle replica tests for the distributed-consistency batch
(q_occ_conflicts / q_quorum_latency / q_rebalance_plan): an FCW conflict
replay, full order-statistic latency curves with pointwise dominance, and
the matching-lower-bound rebalance check."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_occ_conflicts_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT CAST(floor(epoch(ts) / 300) AS BIGINT), user_id % 64 "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    cells = Counter(rows)
    buckets = defaultdict(lambda: dict(n=0, ab=0, mx=0, cells=0))
    for (ep, key), c in cells.items():
        b = buckets[key % 8]
        b["n"] += c
        b["ab"] += c - 1
        b["mx"] = max(b["mx"], c)
        b["cells"] += 1
    n_all = sum(c for c in cells.values())
    ab_all = sum(c - 1 for c in cells.values())
    got = {r["key_bucket"]: r for r in entry.queries()["q_occ_conflicts"](spark, SF).collect()}
    assert set(got) == set(buckets)
    for kb, e in buckets.items():
        r = got[kb]
        assert (r["n_txn"], r["n_aborts"]) == (e["n"], e["ab"])
        assert (r["max_collision"], r["n_cells"]) == (e["mx"], e["cells"])
        assert (r["n_txn_all"], r["n_aborts_all"]) == (n_all, ab_all)
        assert math.isclose(
            r["abort_rate"], round(e["ab"] / e["n"], 6), abs_tol=1e-9
        )
        # FCW invariant: commits == cells (one winner each)
        assert e["n"] - e["ab"] == e["cells"]


def test_quorum_latency_matches_replica(spark):
    ids = [
        i for (i,) in duckdb.sql(
            f"SELECT event_id FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    series = {"single": [], "quorum2": [], "all3": []}
    for i in ids:
        ls = [50 + int(_md5(f"l:{i}:{k}")[:3], 16) % 400 for k in (1, 2, 3)]
        series["single"].append(ls[0])
        series["quorum2"].append(sorted(ls)[1])
        series["all3"].append(max(ls))
    got = {r["mode"]: r for r in entry.queries()["q_quorum_latency"](spark, SF).collect()}
    assert set(got) == set(series)
    pcts = {}
    for mode, xs in series.items():
        xs.sort()
        n = len(xs)
        p50 = next(x for j, x in enumerate(xs, 1) if 2 * j >= n)
        p99 = next(x for j, x in enumerate(xs, 1) if 100 * j >= 99 * n)
        r = got[mode]
        assert (r["n"], r["s"]) == (n, sum(xs))
        assert (r["p50"], r["p99"]) == (p50, p99)
        assert math.isclose(r["mean_lat"], round(sum(xs) / n, 6), abs_tol=1e-6)
        pcts[mode] = (p50, p99, sum(xs) / n)
    # pointwise dominance: quorum's median beats the max everywhere
    assert pcts["quorum2"][1] <= pcts["all3"][1]
    assert pcts["quorum2"][2] <= pcts["all3"][2]
    # one straggler is free: the quorum p99 sits well under all3's
    assert pcts["quorum2"][1] < pcts["all3"][1]


def test_rebalance_plan_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id % 16, count(*) FROM read_parquet('{SF}/events.parquet') "
        f"GROUP BY 1"
    ).fetchall()
    loads = dict(rows)
    n = sum(loads.values())
    lo = (9 * n) // 160
    hi = (11 * n + 159) // 160
    surplus = {s: max(l - hi, 0) for s, l in loads.items()}
    deficit = {s: max(lo - l, 0) for s, l in loads.items()}
    moves = max(sum(surplus.values()), sum(deficit.values()))
    got = {r["shard"]: r for r in entry.queries()["q_rebalance_plan"](spark, SF).collect()}
    assert set(got) == set(loads)
    for s, l in loads.items():
        r = got[s]
        assert (r["load"], r["band_lo"], r["band_hi"]) == (l, lo, hi)
        assert (r["surplus"], r["deficit"]) == (surplus[s], deficit[s])
        assert r["in_band"] == (1 if lo <= l <= hi else 0)
        assert (r["moves_min"], r["total_rows"]) == (moves, n)
    # the matching bound is feasible: moving every surplus row to deficits
    # lands every shard in band (surplus mass covers deficit mass or v.v.)
    assert moves >= sum(deficit.values()) or moves >= sum(surplus.values())
    assert moves <= n  # cannot move more than exists
