"""Independent-oracle property tests for the round-3k operators
(role-transition matrix, topic-shift segmentation, entity salience,
KG-to-text verbalization, corrupted-triple negative sampling):
straight-line Python replicas on the sf0.001 fixtures. The KG-consumer
replicas take the materialized triples (already hash-checked upstream via
q_triples) as input and replicate the NEW arithmetic end to end."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entry.queries()[name](spark, SF)


def _round6(x):
    return float(
        Decimal(str(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _turns(spark):
    """The standard documents-as-transcript derivation: conv = doc_id % 97,
    order/turn_idx by doc_id, role = doc_id % 3 (0 user, 1 assistant, 2 tool)."""
    docs = sorted(
        spark.read.parquet(f"{SF}/documents.parquet").collect(),
        key=lambda d: d["doc_id"],
    )
    convs = {}
    for d in docs:
        convs.setdefault(d["doc_id"] % 97, []).append(
            (["user", "assistant", "tool"][d["doc_id"] % 3], d["text"] or "")
        )
    return convs


def _triples(spark):
    from cliner_spark.queries_r2 import cached_triples

    return cached_triples(spark, SF).collect()


def test_role_transition_matrix_matches_python_replica(spark):
    want = {}
    for turns in _turns(spark).values():
        for (a, _), (b, _) in zip(turns, turns[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    rows = _q(spark, "q_role_transition_matrix").collect()
    assert {(r["from_role"], r["to_role"]) for r in rows} == set(want)
    tot = {}
    for (a, _b), n in want.items():
        tot[a] = tot.get(a, 0) + n
    for r in rows:
        assert r["n"] == want[(r["from_role"], r["to_role"])]
        assert r["row_total"] == tot[r["from_role"]]
        assert abs(r["p"] - _round6(r["n"] / r["row_total"])) < 1e-9
    # probabilities per from_role sum to ~1
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_role"], []).append(r["p"])
    for ps in by_from.values():
        assert abs(sum(ps) - 1.0) < 1e-5


def test_turn_segmentation_matches_python_replica(spark):
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in _q(spark, "q_turn_segmentation").collect()
    }
    n_pairs = 0
    for conv, turns in _turns(spark).items():
        sets = [{t.lower() for t in text.split()} for _, text in turns]
        for i in range(1, len(sets)):
            n_pairs += 1
            inter = len(sets[i - 1] & sets[i])
            uni = len(sets[i - 1]) + len(sets[i]) - inter
            r = got[(str(conv), i)]
            assert (r["ua"], r["ub"], r["inter"], r["uni"]) == (
                len(sets[i - 1]), len(sets[i]), inter, uni,
            )
            assert r["is_boundary"] == (False if uni == 0 else 4 * inter < uni)
    assert len(got) == n_pairs


def test_entity_salience_matches_python_replica(spark):
    asserted = [
        (t["conv_id"], t["subj"])
        for t in _triples(spark)
        if t["pred"] == "ASSERTED_IN"
    ]
    per = {}
    for c, s in asserted:
        per[(c, s)] = per.get((c, s), 0) + 1
    convs = {c for c, _ in asserted}
    df = {}
    for c, s in {(c, s) for c, s in asserted}:
        df[s] = df.get(s, 0) + 1
    sal = {
        (c, s): _round6(n * math.log(len(convs) / df[s]))
        for (c, s), n in per.items()
    }
    want = {}
    for c in convs:
        ranked = sorted(
            ((s, v) for (cc, s), v in sal.items() if cc == c),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        for rk, (s, v) in enumerate(ranked, 1):
            want[(c, s)] = (per[(c, s)], df[s], v, rk)

    rows = _q(spark, "q_entity_salience").collect()
    assert {(r["conv_id"], r["concept"]) for r in rows} == set(want)
    for r in rows:
        n, d, v, rk = want[(r["conv_id"], r["concept"])]
        assert (r["n_turns"], r["df"], r["rk"]) == (n, d, rk)
        assert abs(r["salience"] - v) < 1e-9


def test_kg2text_matches_python_replica(spark):
    mentions = {}
    for t in _triples(spark):
        if t["pred"] == "MENTIONS":
            mentions.setdefault(t["conv_id"], []).append(
                f"{t['obj']} (turn {t['turn_idx']})"
            )
    rows = _q(spark, "q_kg2text").collect()
    assert {r["conv_id"] for r in rows} == set(mentions)
    for r in rows:
        facts = sorted(mentions[r["conv_id"]])
        text = (
            f"Conversation {r['conv_id']} mentions {len(facts)} concepts: "
            + "; ".join(facts)
            + "."
        )
        assert r["n_facts"] == len(facts)
        assert r["text"] == text
        assert r["text_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_kg_negative_samples_match_python_replica(spark):
    pos = {
        (t["conv_id"], t["obj"])
        for t in _triples(spark)
        if t["pred"] == "MENTIONS"
    }
    vocab = sorted({o for _, o in pos})
    n = len(vocab)
    want = {}
    for conv, obj in pos:
        for k in (1, 2, 3, 4):
            h = int(hashlib.md5(f"{conv}#{obj}#{k}".encode()).hexdigest()[:13], 16) % n
            neg = vocab[h]
            if neg != obj and (conv, neg) not in pos:
                want[(conv, obj)] = (neg, k)
                break

    rows = _q(spark, "q_kg_negative_samples").collect()
    assert {(r["conv_id"], r["pos_obj"]) for r in rows} == set(want)
    for r in rows:
        neg, k = want[(r["conv_id"], r["pos_obj"])]
        assert (r["neg_obj"], r["attempt"]) == (neg, k)
        # the leakage filter held: no sampled negative is a true triple
        assert (r["conv_id"], r["neg_obj"]) not in pos
        assert r["neg_obj"] != r["pos_obj"]


# ---- round 3l -------------------------------------------------------------


def test_langid_confusion_matches_python_replica(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    hits = {
        "en": ["the", "and", "of", "is", "was", "with"],
        "es": ["el", "la", "los", "las", "que", "y"],
        "de": ["der", "die", "das", "und", "ist", "nicht"],
        "fr": ["le", "la", "les", "et", "est", "une"],
    }
    cnt, tot = {}, {}
    for d in docs:
        t = f" {(d['text'] or '').lower()} "
        score = {
            lang: sum(1 for w in ws if f" {w} " in t) for lang, ws in hits.items()
        }
        best = max(score.values())
        if best == 0:
            pred = "und"
        else:
            pred = next(
                lang for lang in ("en", "es", "de", "fr") if score[lang] == best
            )
        cnt[(d["lang"], pred)] = cnt.get((d["lang"], pred), 0) + 1
        tot[d["lang"]] = tot.get(d["lang"], 0) + 1
    rows = _q(spark, "q_langid_confusion").collect()
    assert {(r["declared"], r["predicted"]) for r in rows} == set(cnt)
    for r in rows:
        assert r["n"] == cnt[(r["declared"], r["predicted"])]
        assert r["row_total"] == tot[r["declared"]]
        assert abs(r["share"] - _round6(r["n"] / r["row_total"])) < 1e-9


def _concept_graph(spark):
    """Undirected concept co-occurrence adjacency from the (already
    hash-checked) linked mentions: edges between concepts sharing a doc."""
    from cliner_spark.entry_queries import _doc_linked

    dc = {}
    for r in _doc_linked(spark, SF).select("conv_id", "cui").distinct().collect():
        dc.setdefault(r["conv_id"], set()).add(r["cui"])
    adj = {}
    for cuis in dc.values():
        for a in cuis:
            for b in cuis:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    return adj


def _bfs(adj, seed):
    dist = {seed: 0}
    frontier = [seed]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_odd_cycle_audit_matches_python_replica(spark):
    adj = _concept_graph(spark)
    dist = _bfs(adj, "CD001")
    rows = _q(spark, "q_odd_cycle_audit").collect()
    want = {
        (a, b)
        for a in adj
        for b in adj[a]
        if a < b and a in dist and b in dist
    }
    assert {(r["src"], r["dst"]) for r in rows} == want
    any_odd = False
    for r in rows:
        assert (r["src_hops"], r["dst_hops"]) == (dist[r["src"]], dist[r["dst"]])
        assert r["odd_edge"] == ((dist[r["src"]] + dist[r["dst"]]) % 2 == 0)
        any_odd |= r["odd_edge"]
    # the co-occurrence graph has triangles -> it must not look bipartite
    if any(
        len(adj.get(a, set()) & adj.get(b, set())) > 0
        for a in adj for b in adj[a] if a < b
    ):
        assert any_odd


def test_sssp_path_counts_match_python_replica(spark):
    adj = _concept_graph(spark)
    dist = _bfs(adj, "CD001")
    # sigma DP in dist order
    sigma = {"CD001": 1}
    for v in sorted((n for n in dist if n != "CD001"), key=lambda n: dist[n]):
        sigma[v] = sum(
            sigma[u] for u in adj.get(v, ()) if dist.get(u) == dist[v] - 1
        )
    rows = _q(spark, "q_sssp_path_counts").collect()
    reach4 = {n for n, d in dist.items() if d <= 4}
    assert {r["node"] for r in rows} == reach4
    for r in rows:
        assert (r["hops"], r["sigma"]) == (dist[r["node"]], sigma[r["node"]])
    # invariant: seed sigma 1; every non-seed sigma >= 1
    assert all(r["sigma"] >= 1 for r in rows)


def test_instruction_pairs_match_python_replica(spark):
    got = {
        (r["conv_id"], r["prompt_turn_idx"]): r
        for r in _q(spark, "q_instruction_pairs").collect()
    }
    n_pairs = 0
    for conv, turns in _turns(spark).items():
        toks = [len(text.split()) for _, text in turns]
        for i, ((role, _), (nrole, _)) in enumerate(zip(turns, turns[1:])):
            if role == "user" and nrole == "assistant":
                n_pairs += 1
                r = got[(str(conv), i)]
                assert r["response_turn_idx"] == i + 1
                assert (r["prompt_toks"], r["response_toks"]) == (toks[i], toks[i + 1])
                assert r["pair_toks"] == toks[i] + toks[i + 1]
                assert r["fits_budget"] == (toks[i] + toks[i + 1] <= 256)
    assert len(got) == n_pairs
