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
