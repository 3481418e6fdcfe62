"""Independent-oracle replica tests for the geometry/chain batch
(q_jl_distortion / q_markov_stationary / q_graph_greedy_search)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _vecs():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    return {vid: [int(round(float(x) * 1e6)) for x in v] for vid, v in rows}


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def test_jl_distortion_matches_replica(spark):
    mv = _vecs()
    signs = [
        [1 if int(_md5(f"jl:{j}:{i}")[0], 16) % 2 == 0 else -1 for i in range(64)]
        for j in range(16)
    ]

    def proj(m):
        return [sum(x * s for x, s in zip(m, row)) for row in signs]

    rows = entry.queries()["q_jl_distortion"](spark, SF).collect()
    assert len(rows) == len(mv) // 2
    got = {r["pair_id"]: r for r in rows}
    n_band = 0
    for a in sorted(mv):
        if a % 2 or a + 1 not in mv:
            continue
        d2o = _d2(mv[a], mv[a + 1])
        d2p = _d2(proj(mv[a]), proj(mv[a + 1]))
        r = got[a]
        assert (r["d2_orig"], r["d2_proj"], r["expect_den"]) == (
            d2o,
            d2p,
            16 * d2o,
        )
        if 16 * d2o // 2 <= d2p <= 16 * d2o * 2:
            n_band += 1
    # JL concentration: the bulk of pairs land within 2x of expectation
    assert n_band >= 0.8 * len(rows)


def test_markov_stationary_matches_replica(spark):
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type "
        f"FROM read_parquet('{SF}/events.parquet') ORDER BY user_id, ts, event_id"
    ).fetchall()
    trans = defaultdict(int)
    prev = {}
    for uid, _ts, _eid, ty in ev:
        if uid in prev:
            trans[(prev[uid], ty)] += 1
        prev[uid] = ty
    rowsum = defaultdict(int)
    for (a, _b), n in trans.items():
        rowsum[a] += n
    p = {(a, b): (n << 20) // rowsum[a] for (a, b), n in trans.items()}
    types = sorted({ty for _u, _t, _e, ty in ev})
    v = {t: (1 << 20) // len(types) for t in types}
    seen = []
    for _ in range(3):
        nv = defaultdict(int)
        for (a, b), pf in p.items():
            nv[b] += v[a] * pf
        v = {b: m // (1 << 20) for b, m in nv.items()}
        seen.append(dict(v))
    rows = entry.queries()["q_markov_stationary"](spark, SF).collect()
    assert len(rows) == len(types)
    for r in rows:
        t = r["event_type"]
        assert r["p1_fp"] == seen[0].get(t, 0)
        assert r["p2_fp"] == seen[1].get(t, 0)
        assert r["p3_fp"] == seen[2].get(t, 0)
    # fixed-point mass conservation: floors only ever lose mass, boundedly
    tot = sum(r["p3_fp"] for r in rows)
    assert (1 << 20) - 3 * 2 * len(types) ** 2 <= tot <= (1 << 20)
    # ranking pinned
    ranked = sorted(rows, key=lambda r: (-r["p3_fp"], r["event_type"]))
    assert [r["rnk"] for r in ranked] == list(range(1, len(types) + 1))


def test_graph_greedy_search_matches_replica(spark):
    mv = _vecs()
    raw = {
        vid: [float(x) for x in v]
        for vid, v in duckdb.sql(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF}/embeddings.parquet')"
        ).fetchall()
    }
    # buckets: 4 md5 hyperplanes, rounded-6 projection sign (similarity.py)
    planes = [
        [1.0 if int(_md5(f"{p}#{d}")[0], 16) < 8 else -1.0 for d in range(64)]
        for p in range(4)
    ]
    bucket = {}
    for vid, v in raw.items():
        b = 0
        for p, w in enumerate(planes):
            acc = 0.0
            for x, wi in zip(v, w):
                acc += x * wi
            if round(acc, 6) > 0:
                b += 1 << p
        bucket[vid] = b
    edges = set()
    by_b = defaultdict(list)
    for vid in sorted(bucket):
        by_b[bucket[vid]].append(vid)
    for vids in by_b.values():
        edges.update(zip(vids, vids[1:]))
    ids = sorted(mv)
    edges.update((a, a + 1) for a in ids if a + 1 in mv)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    ev = min(ids)
    qs = sorted(
        (i for i in ids if i != ev), key=lambda i: (_md5(f"gq:{i}"), i)
    )[:12]
    expected = {}
    for q in qs:
        cur, d2 = ev, _d2(mv[ev], mv[q])
        start, moves, last = d2, 0, 1
        for _hop in range(6):
            nb = min(adj[cur], key=lambda n: (_d2(mv[n], mv[q]), n))
            nd2 = _d2(mv[nb], mv[q])
            if nd2 < d2:
                cur, d2, moves, last = nb, nd2, moves + 1, 1
            else:
                last = 0
        expected[q] = (start, cur, d2, moves, last == 0)
    rows = entry.queries()["q_graph_greedy_search"](spark, SF).collect()
    got = {
        r["query_id"]: (
            r["start_d2"],
            r["final_node"],
            r["final_d2"],
            r["n_moves"],
            r["converged"],
        )
        for r in rows
    }
    assert got == expected
    # descent invariant + fixture non-vacuity (movers AND stay-puts occur)
    assert all(r["final_d2"] <= r["start_d2"] for r in rows)
    assert any(r["n_moves"] > 0 for r in rows)
    assert any(r["n_moves"] == 0 for r in rows)
