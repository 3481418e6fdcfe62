"""Unit tests for round-3 graph ops: strongly connected components,
deterministic label propagation, multi-source eccentricity — hand-checkable
graphs plus randomized replicas vs straight-line Python."""

from __future__ import annotations

import random
from collections import deque

from cliner_spark.graph import (
    eccentricity,
    label_propagation,
    strongly_connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame([{"src": a, "dst": b} for a, b in pairs])


# --- strongly connected components -----------------------------------------


def _scc_oracle(pairs):
    """Brute-force SCC via per-node forward/backward DFS reachability."""
    nodes = {x for p in pairs for x in p}
    fwd, bwd = {n: set() for n in nodes}, {n: set() for n in nodes}
    for a, b in pairs:
        fwd[a].add(b)
        bwd[b].add(a)

    def reach(start, adj):
        seen, stack = set(), [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    out = {}
    for n in nodes:
        mutual = reach(n, fwd) & reach(n, bwd)
        out[n] = min(mutual | {n})
    return out


def test_scc_cycle_and_tail(spark):
    # cycle a->b->c->a plus tail c->d: {a,b,c} one SCC labelled 'a',
    # d a singleton
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    got = {r["node"]: r["scc_id"] for r in strongly_connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_scc_two_cycles_bridged_one_way(spark):
    # two 2-cycles joined by a one-way bridge stay separate SCCs
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c")],
    )
    got = {r["node"]: r["scc_id"] for r in strongly_connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_scc_random_replica(spark):
    rng = random.Random(17)
    nodes = [f"n{i:02d}" for i in range(12)]
    pairs = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(30)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(_edges(spark, pairs)).collect()
    }
    assert got == _scc_oracle(pairs)


# --- label propagation ------------------------------------------------------


def _lpa_oracle(pairs, rounds=3):
    """Straight-line synchronous LPA, mode label with min tie-break."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for v in nbrs:
                counts[lbl[v]] = counts.get(lbl[v], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lbl = new
    return lbl


def test_lpa_two_cliques_with_bridge(spark):
    # two triangles bridged by one edge: each keeps its own min label
    left = [(1, 2), (2, 3), (1, 3)]
    right = [(7, 8), (8, 9), (7, 9)]
    pairs = left + right + [(3, 7)]
    got = {
        r["node"]: r["community"]
        for r in label_propagation(_edges(spark, pairs), rounds=3).collect()
    }
    assert got == _lpa_oracle(pairs, rounds=3)
    # the two cliques resolve to distinct communities
    assert got[1] == got[2] == got[3] != got[8]


def test_lpa_random_replica_matches_python(spark):
    rng = random.Random(23)
    pairs = list({tuple(sorted(rng.sample(range(14), 2))) for _ in range(25)})
    got = {
        r["node"]: r["community"]
        for r in label_propagation(_edges(spark, pairs), rounds=3).collect()
    }
    assert got == _lpa_oracle(pairs, rounds=3)


# --- eccentricity ------------------------------------------------------------


def _ecc_oracle(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        out[s] = (max(dist.values()), len(dist))
    return out


def test_eccentricity_path_graph(spark):
    # path a-b-c-d: ecc a=3 b=2 c=2 d=3; all reach 4
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {
        r["node"]: (r["ecc"], r["n_reachable"]) for r in eccentricity(e).collect()
    }
    assert got == {"a": (3, 4), "b": (2, 4), "c": (2, 4), "d": (3, 4)}


def test_eccentricity_disconnected_components(spark):
    # two disjoint edges: every node ecc 1, reach 2 (its own component only)
    e = _edges(spark, [("a", "b"), ("c", "d")])
    got = {
        r["node"]: (r["ecc"], r["n_reachable"]) for r in eccentricity(e).collect()
    }
    assert got == {n: (1, 2) for n in "abcd"}


def test_eccentricity_random_replica(spark):
    rng = random.Random(31)
    pairs = list({tuple(sorted(rng.sample(range(12), 2))) for _ in range(18)})
    pairs = [(f"v{a}", f"v{b}") for a, b in pairs]
    got = {
        r["node"]: (r["ecc"], r["n_reachable"])
        for r in eccentricity(_edges(spark, pairs)).collect()
    }
    assert got == _ecc_oracle(pairs)


# --- bfs path explanations ----------------------------------------------------


def test_bfs_paths_picks_canonical_witness(spark):
    # two equal-length shortest paths a-b-d and a-c-d: witness must be the
    # lexicographically smaller one (a>b>d); e unreachable at its own comp
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    from cliner_spark.graph import bfs_paths

    got = {r["node"]: (r["hops"], r["path"]) for r in bfs_paths(e, "a").collect()}
    assert got == {
        "a": (0, "a"),
        "b": (1, "a>b"),
        "c": (1, "a>c"),
        "d": (2, "a>b>d"),
    }


def test_bfs_paths_random_replica(spark):
    # uniform-width node names (the canonical-witness contract); compare
    # against exhaustive simple-path enumeration
    rng = random.Random(41)
    nodes = [f"n{i:02d}" for i in range(8)]
    pairs = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(12)})
    from cliner_spark.graph import bfs_paths

    got = {
        r["node"]: (r["hops"], r["path"])
        for r in bfs_paths(_edges(spark, pairs), nodes[0], max_hops=8).collect()
    }

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # brute force: all simple paths from seed, shortest per node, min string
    best = {nodes[0]: (0, nodes[0])}
    stack = [(nodes[0], [nodes[0]])]
    while stack:
        u, path = stack.pop()
        for v in adj.get(u, ()):
            if v in path:
                continue
            p2 = path + [v]
            key = (len(p2) - 1, ">".join(p2))
            if v not in best or key < best[v]:
                best[v] = key
            if len(p2) <= 8:
                stack.append((v, p2))
    assert got == best
