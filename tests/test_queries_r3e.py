"""Independent-oracle property tests for the round-3m (batch-10) operators
(k-anonymity audit, FastSS spell candidates, containment pairs, Copeland
rank): straight-line Python replicas on the sf0.001 fixtures, plus the
structural invariants each operator must satisfy (FastSS completeness vs a
brute-force edit-distance scan; containment superset of high-Jaccard dup
pairs; Copeland score bounds)."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entry.queries()[name](spark, SF)


def _docs(spark):
    return sorted(
        spark.read.parquet(f"{SF}/documents.parquet").collect(),
        key=lambda d: d["doc_id"],
    )


def _toks(text):
    return [t for t in (text or "").strip().split() if t]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_k_anonymity_matches_python_replica(spark):
    classes = {}
    for d in _docs(spark):
        key = (d["lang"], d["source"], d["n_chars"] // 64)
        cls = classes.setdefault(key, {"k": 0, "sens": set()})
        cls["k"] += 1
        cls["sens"].add(d["doc_id"] % 5)
    rows = {(r["lang"], r["source"], r["len_band"]): r
            for r in _q(spark, "q_k_anonymity").collect()}
    assert set(rows) == set(classes)
    for key, cls in classes.items():
        r = rows[key]
        assert r["k"] == cls["k"]
        assert r["l_div"] == len(cls["sens"])
        assert r["at_risk"] == (cls["k"] < 5)
    # the union of class sizes accounts for every document exactly once
    assert sum(c["k"] for c in classes.values()) == len(_docs(spark))


def test_spell_candidates_complete_vs_bruteforce(spark):
    docs = _docs(spark)
    # replica of the deterministic query-log derivation
    qterms = {}
    for d in docs:
        toks = _toks(d["text"])
        if not toks:
            continue
        w = toks[d["doc_id"] % len(toks)].lower()
        if len(w) < 3:
            continue
        pos = d["doc_id"] % len(w)  # 0-based deletion position
        qt = w[:pos] + w[pos + 1 :]
        qterms.setdefault(qt, set()).add(d["doc_id"])
    vocab = {t.lower() for d in docs for t in _toks(d["text"]) if len(t) >= 3}
    # brute force: EVERY (qterm, vocab word) pair at lev <= 1 must be found
    want = {
        (qt, w): _lev(qt, w)
        for qt in qterms
        for w in vocab
        if _lev(qt, w) <= 1
    }
    rows = _q(spark, "q_spell_candidates").collect()
    got = {(r["qterm"], r["match_term"]): r for r in rows}
    assert set(got) == set(want), "FastSS blocking must be COMPLETE for d<=1"
    for (qt, w), r in got.items():
        assert r["dist"] == want[(qt, w)]
        assert r["n_docs"] == len(qterms[qt])
    # sanity: the corpus actually exercises both distances
    assert any(d == 0 for d in want.values()) or any(
        d == 1 for d in want.values()
    )


def test_containment_pairs_matches_bruteforce(spark):
    docs = _docs(spark)
    sh = {}
    for d in docs:
        toks = [t.lower() for t in _toks(d["text"])]
        s = {
            " ".join(toks[i : i + 4]) for i in range(len(toks) - 3)
        } if len(toks) >= 4 else set()
        sh[d["doc_id"]] = s
    # df-cut universe (df <= 50), applied to shingle sets before counting
    df = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    shk = {i: {g for g in s if df[g] <= 50} for i, s in sh.items()}
    want = {}
    ids = [i for i, s in shk.items() if s]
    for a in ids:
        for b in ids:
            if a == b:
                continue
            inter = len(shk[a] & shk[b])
            if inter and 4 * inter >= 3 * len(shk[a]):
                want[(a, b)] = (inter, len(shk[a]), len(shk[b]))
    rows = _q(spark, "q_containment_pairs").collect()
    got = {
        (r["doc_in"], r["doc_out"]): (r["common"], r["size_in"], r["size_out"])
        for r in rows
    }
    assert got == want
    assert want, "fixture must exercise the containment path"


def test_copeland_rank_matches_python_replica(spark):
    docs = _docs(spark)
    score = {d["doc_id"]: len({t.lower() for t in _toks(d["text"])}) for d in docs}
    by_id = {d["doc_id"] for d in docs}
    tally = {}
    for a in sorted(by_id):
        b = a + 1
        if b not in by_id:
            continue
        pa, pb = a % 8, b % 8
        if pa == pb:
            continue
        p, q = min(pa, pb), max(pa, pb)
        sp = score[a] if pa < pb else score[b]
        sq = score[b] if pa < pb else score[a]
        t = tally.setdefault((p, q), [0, 0])
        if sp > sq:
            t[0] += 1
        elif sq > sp:
            t[1] += 1
    stats = {}
    for (p, q), (wp, wq) in tally.items():
        for player, mine, theirs in ((p, wp, wq), (q, wq, wp)):
            s = stats.setdefault(player, {"n": 0, "b": 0, "l": 0, "t": 0})
            s["n"] += 1
            if mine > theirs:
                s["b"] += 1
            elif mine < theirs:
                s["l"] += 1
            else:
                s["t"] += 1
    rows = {r["player"]: r for r in _q(spark, "q_copeland_rank").collect()}
    assert set(rows) == set(stats)
    for p, s in stats.items():
        r = rows[p]
        assert (r["n_opponents"], r["beats"], r["losses"], r["ties"]) == (
            s["n"], s["b"], s["l"], s["t"],
        )
        assert r["copeland"] == s["b"] - s["l"]
        # Copeland bounds: |score| <= opponents faced; components sum up
        assert abs(r["copeland"]) <= r["n_opponents"]
        assert r["beats"] + r["losses"] + r["ties"] == r["n_opponents"]


# ---------------------------------------------------------------------------
# batch 11: modularity, source overlap, assortativity
# ---------------------------------------------------------------------------


def _docpair_graph(spark):
    """Python replica of the doc-similarity graph (>=2 shared 3-shingles,
    df-cut 50): returns (edges set of (lo, hi), degrees dict)."""
    sh = {}
    for d in _docs(spark):
        toks = [t.lower() for t in _toks(d["text"])]
        sh[d["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
    df = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    shf = {i: {g for g in s if df[g] <= 50} for i, s in sh.items()}
    ids = sorted(shf)
    edges = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if len(shf[a] & shf[b]) >= 2:
                edges.add((a, b))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return edges, deg


def _lpa3(edges):
    """3 synchronous LPA rounds, most-frequent-neighbor label, min tie-break."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for v in nbrs:
                cnt[lbl[v]] = cnt.get(lbl[v], 0) + 1
            best = min(cnt, key=lambda l: (-cnt[l], l))
            new[n] = best
        lbl = new
    return lbl


def test_modularity_matches_python_replica(spark):
    edges, deg = _docpair_graph(spark)
    lbl = _lpa3(edges)
    m = len(edges)
    comms = {}
    for n, c in lbl.items():
        s = comms.setdefault(c, {"n": 0, "dsum": 0, "intra": 0})
        s["n"] += 1
        s["dsum"] += deg[n]
    for a, b in edges:
        if lbl[a] == lbl[b]:
            comms[lbl[a]]["intra"] += 1
    rows = {r["community"]: r for r in _q(spark, "q_modularity").collect()}
    assert set(rows) == set(comms)
    q_total = 0
    for c, s in comms.items():
        r = rows[c]
        assert (r["n_nodes"], r["intra_edges"], r["deg_sum"]) == (
            s["n"], s["intra"], s["dsum"],
        )
        assert r["q_num"] == 4 * m * s["intra"] - s["dsum"] ** 2
        assert r["m"] == m
        q_total += r["q_num"]
    # modularity is a proper fraction: -1/2 <= Q <= 1
    assert -2 * m * m <= q_total <= 4 * m * m
    # 3-round LPA on a similarity graph should beat the null model overall
    assert q_total > 0


def test_source_overlap_matches_python_replica(spark):
    by_src = {}
    for d in _docs(spark):
        toks = [t.lower() for t in _toks(d["text"])]
        s = by_src.setdefault(d["source"], set())
        s.update(
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        )
    srcs = sorted(by_src)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(by_src[a] & by_src[b])
            if inter:
                want[(a, b)] = (inter, len(by_src[a]), len(by_src[b]))
    rows = _q(spark, "q_source_overlap").collect()
    got = {
        (r["src_a"], r["src_b"]): (r["shared"], r["size_a"], r["size_b"])
        for r in rows
    }
    assert got == want
    assert want, "fixture sources must overlap somewhere"


def test_graph_assortativity_matches_python_replica(spark):
    edges, deg = _docpair_graph(spark)
    dir_edges = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    M = len(dir_edges)
    s1 = sum(deg[a] + deg[b] for a, b in dir_edges)
    s_prod = sum(deg[a] * deg[b] for a, b in dir_edges)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in dir_edges)
    [r] = _q(spark, "q_graph_assortativity").collect()
    assert (r["n_dir_edges"], r["s1"], r["s_prod"], r["s2"]) == (M, s1, s_prod, s2)
    # derived Pearson r must be a valid correlation
    num = M * s_prod - (s1 / 2) ** 2
    den = M * s2 / 2 - (s1 / 2) ** 2
    if den:
        assert -1.0 - 1e-9 <= num / den <= 1.0 + 1e-9
