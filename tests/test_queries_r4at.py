"""Independent-oracle replica tests for the LLM-infra/caching/privacy
batch (q_router_cascade / q_lfu_hit_rate / q_secure_agg): a full routing
replay with the monotone frontier, an offline cache simulation guarding
the look-ahead leak, and the SecAgg mask-cancellation + subset-exposure
proof."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_router_cascade_matches_replica(spark):
    ids = [
        i for (i,) in duckdb.sql(
            f"SELECT event_id FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    got = {r["tau"]: r for r in entry.queries()["q_router_cascade"](spark, SF).collect()}
    assert set(got) == {64, 128, 192}
    prev_acc = prev_apc = None
    for tau in (64, 128, 192):
        esc = corr = 0
        for i in ids:
            conf = int(_md5(f"cf:{i}")[:2], 16)
            coin = int(_md5(f"c:{i}")[:2], 16)
            if conf < tau:
                esc += 1
                corr += 1
            elif coin < conf:
                corr += 1
        r = got[tau]
        assert (r["n_requests"], r["n_escalated"], r["n_correct"]) == (
            len(ids), esc, corr,
        )
        assert r["cost_units"] == len(ids) + 9 * esc
        assert math.isclose(r["accuracy"], round(corr / len(ids), 6), abs_tol=1e-9)
        assert math.isclose(
            r["accuracy_per_cost"],
            round(corr / (len(ids) + 9 * esc), 6), abs_tol=1e-9,
        )
        # the frontier: accuracy rises with tau, accuracy-per-cost falls
        if prev_acc is not None:
            assert r["accuracy"] > prev_acc
            assert r["accuracy_per_cost"] < prev_apc
        prev_acc, prev_apc = r["accuracy"], r["accuracy_per_cost"]


def test_lfu_hit_rate_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    per_hour = defaultdict(Counter)
    for k, h in rows:
        per_hour[h][k] += 1
    cache_for = {}
    for h, cnt in per_hour.items():
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:32]
        cache_for[h + 1] = {k for k, _c in top}
    h0 = min(h for _k, h in rows)
    buckets = defaultdict(lambda: dict(n=0, hits=0, elig=0))
    for k, h in rows:
        b = buckets[k % 8]
        b["n"] += 1
        if h > h0:
            b["elig"] += 1
            # the refresh boundary: hour h consults hour h-1's counts ONLY
            if k in cache_for.get(h, set()):
                b["hits"] += 1
    got = {r["key_bucket"]: r for r in entry.queries()["q_lfu_hit_rate"](spark, SF).collect()}
    assert set(got) == set(buckets)
    for kb, e in buckets.items():
        r = got[kb]
        assert (r["n_accesses"], r["n_hits"], r["n_eligible"]) == (
            e["n"], e["hits"], e["elig"],
        )
        assert math.isclose(
            r["hit_rate"], round(e["hits"] / e["elig"], 6), abs_tol=1e-9
        )
    # frequency admission must beat nothing: some hits exist overall
    assert sum(e["hits"] for e in buckets.values()) > 0


def test_secure_agg_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id % 8, count(*) FROM read_parquet('{SF}/events.parquet') "
        f"GROUP BY 1"
    ).fetchall()
    xv = dict(rows)
    masks = {
        (i, j): int(_md5(f"mask:{i}-{j}")[:7], 16)
        for i in range(8)
        for j in range(i + 1, 8)
    }
    uploads = {}
    for c in sorted(xv):
        u = xv[c]
        for (i, j), m in masks.items():
            if c == i:
                u += m
            elif c == j:
                u -= m
        uploads[c] = u
    got = {r["cid"]: r for r in entry.queries()["q_secure_agg"](spark, SF).collect()}
    assert set(got) == set(xv)
    true_sum = sum(xv.values())
    for c, x in xv.items():
        r = got[c]
        assert (r["private_value"], r["upload"]) == (x, uploads[c])
        assert r["mask_magnitude"] == abs(uploads[c] - x)
        assert (r["true_sum"], r["recovered_sum"]) == (true_sum, sum(uploads.values()))
        assert r["masks_cancel"] == 1
        assert r["value_hidden"] == 1  # 28-bit masks dwarf the counts
    # exact cancellation, independently
    assert sum(uploads.values()) == true_sum
    # dropout boundary: any PROPER subset's upload sum misses its partial
    # sum (the masks to absent clients do not cancel)
    for drop in range(8):
        part_true = sum(x for c, x in xv.items() if c != drop)
        part_up = sum(u for c, u in uploads.items() if c != drop)
        assert part_up != part_true
