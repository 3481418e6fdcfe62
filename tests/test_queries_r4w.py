"""Independent-oracle replica tests for the robust-stats + weighted-SSSP
batch (q_order_stats / q_weighted_median / q_bellman_ford_hubs)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
PACK = 1 << 20


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_order_stats_match_replica(spark):
    by_src = defaultdict(list)
    for d, s, nc in _docs():
        by_src[s].append((nc, d))
    rows = {r["source"]: r for r in entry.queries()["q_order_stats"](spark, SF).collect()}
    assert set(rows) == set(by_src)
    for s, vals in by_src.items():
        vals.sort()
        n = len(vals)
        xs = [x for x, _ in vals]
        p50 = xs[(n + 1) // 2 - 1]
        p90 = xs[(9 * n + 9) // 10 - 1]
        p99 = xs[(99 * n + 99) // 100 - 1]
        mad = sorted(abs(x - p50) for x in xs)[(n + 1) // 2 - 1]
        r = rows[s]
        assert (r["n"], r["p50"], r["p90"], r["p99"], r["mad"]) == (
            n, p50, p90, p99, mad,
        )
        assert p50 <= p90 <= p99
    # robust vs tail: somewhere the tail is fat (p99 > p50)
    assert any(r["p99"] > r["p50"] for r in rows.values())


def test_weighted_median_and_hoover_match_replica(spark):
    by_src = defaultdict(list)
    for d, s, nc in _docs():
        by_src[s].append((nc, d))
    rows = {r["source"]: r for r in entry.queries()["q_weighted_median"](spark, SF).collect()}
    assert set(rows) == set(by_src)
    for s, vals in by_src.items():
        vals.sort()
        n = len(vals)
        w_tot = sum(x for x, _ in vals)
        cum = 0
        wmed = None
        for x, _ in vals:
            cum += x
            if 2 * cum >= w_tot:
                wmed = x
                break
        hoover_num = sum(abs(n * x - w_tot) for x, _ in vals)
        r = rows[s]
        assert (r["n"], r["total_chars"], r["weighted_median"]) == (n, w_tot, wmed)
        assert (r["hoover_num"], r["hoover_den"]) == (hoover_num, 2 * n * w_tot)
        assert 0 <= hoover_num < 2 * n * w_tot  # 0 <= H < 1
        # under right skew the char-weighted median sits at or above the
        # doc-count median
        xs = [x for x, _ in vals]
        assert wmed >= xs[(n + 1) // 2 - 1]
    assert any(r["hoover_num"] > 0 for r in rows.values())


def test_bellman_ford_matches_replica(spark):
    n_vec = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    edges = defaultdict(list)  # u -> [(t, wt)]
    for u in range(n_vec):
        h = hashlib.md5(f"bf:{u}".encode()).hexdigest()
        if u + 1 < n_vec:
            w = 1 + int(h[0], 16)
            edges[u].append((u + 1, w))
            edges[u + 1].append((u, w))
        if u + 7 < n_vec:
            w = 18 + int(h[1], 16)
            edges[u].append((u + 7, w))
            edges[u + 7].append((u, w))
    d = {v: v for v in range(0, n_vec, 100)}  # pack = dist*PACK + hub
    snapshots = []
    for _ in range(4):
        nd = dict(d)
        for u, pk in d.items():
            for t, w in edges[u]:
                cand = pk + w * PACK
                if t not in nd or cand < nd[t]:
                    nd[t] = cand
        d = nd
        snapshots.append(dict(d))
    rows = {r["vec_id"]: r for r in entry.queries()["q_bellman_ford_hubs"](spark, SF).collect()}
    assert len(rows) == n_vec
    for v in range(n_vec):
        r = rows[v]
        if v in d:
            assert r["reached"]
            assert r["dist"] == d[v] // PACK
            assert r["hub"] == d[v] % PACK
            assert r["first_round"] == next(
                i for i, snap in enumerate(snapshots, 1) if v in snap
            )
        else:
            assert not r["reached"]
            assert r["dist"] is None and r["hub"] is None and r["first_round"] is None
    # fixture non-vacuity: hubs at 0, frontier grows, some nodes stay
    # unreached in 4 hops, chords are actually used (a +7 neighbor is
    # reached in round 1 with a chord-range weight)
    assert rows[0]["dist"] == 0 and rows[0]["hub"] == 0
    assert any(not rows[v]["reached"] for v in range(n_vec))
    assert any(rows[v]["reached"] and rows[v]["dist"] > 0 for v in range(n_vec))
    assert any(
        rows[v]["first_round"] == 1 and rows[v]["dist"] >= 18
        for v in range(n_vec)
        if rows[v]["reached"]
    )
