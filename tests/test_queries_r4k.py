"""Independent-oracle property test for q_luby_mis: a straight-line Luby
replica plus the independence/maximality invariants."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _doc_edges():
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    sh = defaultdict(set)
    for doc_id, text in docs:
        toks = [t.lower() for t in (text or "").split()]
        for i in range(len(toks) - 2):
            sh[" ".join(toks[i : i + 3])].add(doc_id)
    common = Counter()
    for _s, ds in sh.items():
        if len(ds) > 50:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                common[(ds[i], ds[j])] += 1
    return {e for e, c in common.items() if c >= 2}


def test_luby_mis_matches_replica(spark):
    edges = _doc_edges()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = set(adj)

    def key(r, v):
        return hashlib.md5(f"{r}:{v}".encode()).hexdigest() + "#" + str(v).zfill(12)

    surv = set(nodes)
    sel_round = {}
    for r in (1, 2, 3):
        ks = {v: key(r, v) for v in surv}
        sel = {
            v
            for v in surv
            if all(ks[v] < ks[u] for u in adj[v] if u in surv)
        }
        for v in sel:
            sel_round[v] = r
        elim = set(sel)
        for v in sel:
            elim |= adj[v] & surv
        surv -= elim
    got = {
        r["node"]: r
        for r in (
            x.asDict()
            for x in entry.queries()["q_luby_mis"](spark, SF).collect()
        )
    }
    assert set(got) == nodes
    for v, r in got.items():
        assert r["sel_round"] == sel_round.get(v, -1)
        assert r["still_active"] == (v in surv)
    # MIS invariants: the selected set is independent...
    selected = {v for v, r in sel_round.items()}
    for a, b in edges:
        assert not (a in selected and b in selected)
    # ...and maximal over the processed portion: every non-selected,
    # no-longer-active node has a selected neighbor
    for v in nodes - selected - surv:
        assert any(u in selected for u in adj[v])
    # the fixture graph actually exercises selection and elimination
    assert selected and (nodes - selected - surv)
