"""Seeded randomized replica tests for the round-2b operators (kappa,
turn echo, conversation segmentation, gap-trigger relations): random input,
independent pure-Python oracle, exact comparison."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F


def test_kappa_formula_matches_python_on_random_confusions(spark):
    """evaluate.kappa_from_confusion must equal the straightforward float
    kappa on random label-pair samples — including DENSE confusion matrices,
    where an inflated chance term (summing marginal products over every
    observed cell instead of matching labels) degenerates the denominator
    to zero. Regression test for exactly that bug."""
    from cliner_spark.evaluate import kappa_from_confusion

    types = ["problem", "test", "treatment"]
    for seed in (3, 11, 29):
        rng = random.Random(seed)
        pairs = [
            (rng.choice(types), rng.choice(types)) for _ in range(rng.randrange(50, 300))
        ]
        cm = Counter(pairs)
        n = sum(cm.values())
        agree = sum(v for (g, p), v in cm.items() if g == p)
        row = Counter()
        col = Counter()
        for (g, p), v in cm.items():
            row[g] += v
            col[p] += v
        po = agree / n
        pe = sum(row[t] * col[t] for t in set(row) | set(col)) / (n * n)
        want = (po - pe) / (1 - pe)

        df = spark.createDataFrame(pairs, "gold_type string, pred_type string")
        cmdf = df.groupBy("gold_type", "pred_type").agg(F.count(F.lit(1)).alias("n"))
        got = kappa_from_confusion(cmdf).collect()[0]["kappa"]
        assert abs(got - want) < 1e-12 and -1.0 <= got <= 1.0, (seed, got, want)


def _py_jaccard(a, b):
    sa, sb = set(a), set(b)
    u = len(sa | sb)
    return (len(sa & sb) / u) if u else 0.0


def test_turn_echo_and_segments_match_python(spark):
    """Adjacent-turn echo sums and topic-shift segment counts must equal a
    per-conversation sequential Python replica on random token streams —
    catches window-frame and boundary-rule drift."""
    from cliner_spark.entry_queries import REGISTRY

    vocab = [f"w{i}" for i in range(12)]
    for seed in (5, 17):
        rng = random.Random(seed)
        rows = []
        for doc_id in range(240):
            n = rng.randrange(0, 9)
            rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
        # python truth over the docs-as-transcripts convention
        convs = {}
        for doc_id, text in rows:
            convs.setdefault(doc_id % 97, []).append((doc_id, text))
        want_echo, want_segs = {}, {}
        for cid, turns in convs.items():
            toks = [t.split() for _, t in sorted(turns)]
            pairs = list(zip(toks, toks[1:]))
            sc = sum(len(set(a) & set(b)) for a, b in pairs)
            su = sum(len(set(a) | set(b)) for a, b in pairs)
            want_echo[str(cid)] = (len(pairs), sc, su)
            nseg = 0
            for i, t in enumerate(toks):
                j = _py_jaccard(toks[i - 1], t) if i else None
                if j is None or j < 0.2:
                    nseg += 1
            want_segs[str(cid)] = nseg

        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "documents.parquet")
            spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
                1
            ).write.parquet(p)
            echo = {
                r["conv_id"]: (r["n_pairs"], r["sum_common"], r["sum_union"])
                for r in REGISTRY["q_turn_echo"].spark_fn(spark, td).collect()
            }
            segs = {
                r["conv_id"]: r["n_segments"]
                for r in REGISTRY["q_conv_segments"].spark_fn(spark, td).collect()
            }
        want_echo = {k: v for k, v in want_echo.items() if v[0] > 0}
        assert echo == want_echo, seed
        assert segs == want_segs, seed


def test_gap_trigger_relations_match_python(spark):
    """q_relations' join+slice+trigger pipeline must equal a quadratic
    Python scan over the linked mentions of random gazetteer-planted docs."""
    from cliner_spark.entry_queries import (
        DOC_TERMS,
        _doc_mentions_spark,
        doc_gazetteer_df,
        REGISTRY,
    )
    from cliner_spark import fixtures

    gaz_type = {}
    gaz_cui = {}
    for term, cui, sem, _c, score in fixtures.DOC_GAZETTEER:
        # mirror link tie-break: keep best (score desc, cui asc) per term
        cur = gaz_cui.get(term)
        if cur is None or (-score, cui) < cur[0]:
            gaz_cui[term] = ((-score, cui), cui, sem)
    link = {t: (v[1], v[2]) for t, v in gaz_cui.items()}

    filler = ["fast", "slow", "value", "the", "a", "key"]
    planted = [t for t in DOC_TERMS if " " not in t]
    for seed in (9,):
        rng = random.Random(seed)
        rows = []
        for doc_id in range(150):
            n = rng.randrange(3, 18)
            toks = [
                rng.choice(planted) if rng.random() < 0.35 else rng.choice(filler)
                for _ in range(n)
            ]
            rows.append((doc_id, " ".join(toks)))

        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "documents.parquet")
            spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
                1
            ).write.parquet(p)
            got = {
                (r["subj_cui"], r["pred"], r["obj_cui"]): r["n"]
                for r in REGISTRY["q_relations"].spark_fn(spark, td).collect()
            }
            # python replica: longest-match dominance over 1..4-grams,
            # then ordered pairs with gap <= 8 and trigger tokens
            mentions = {
                (r["doc_id"], r["tok_start"], r["tok_end"])
                for r in _doc_mentions_spark(spark, td).collect()
            }
        by_doc = {}
        for doc_id, s, e in mentions:
            by_doc.setdefault(doc_id, []).append((s, e))
        texts = dict(rows)
        want = Counter()
        for doc_id, spans in by_doc.items():
            toks = texts[doc_id].split()
            ms = []
            for s, e in spans:
                term = " ".join(toks[s : e + 1]).lower()
                if term in link:
                    ms.append((s, e, *link[term]))
            for (s1, e1, c1, t1) in ms:
                for (s2, e2, c2, t2) in ms:
                    if not (e1 < s2 and s2 - e1 <= 8) or t1 != "problem":
                        continue
                    gap = toks[e1 + 1 : s2]
                    if t2 == "treatment" and "fast" in gap:
                        want[(c1, "TREATED_WITH", c2)] += 1
                    elif t2 == "test" and "value" in gap:
                        want[(c1, "INVESTIGATED_BY", c2)] += 1
        assert got == dict(want), (seed, got, dict(want))


def test_bm25_matches_python_on_random_corpus(spark):
    """textstats.bm25_rank must equal a straight-line Python BM25 (idf, tf
    norm, per-term 6-dp rounding, top-k tie-break) on random corpora —
    parameter/formula drift here is invisible to the shared-formula oracle."""
    import math

    from cliner_spark.textstats import bm25_rank

    vocab = [f"w{i}" for i in range(15)]
    query = ["w1", "w2", "w3"]
    for seed in (13, 31):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25))))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(5)
        got = [
            (r["doc_id"], round(r["score"], 6), r["rk"])
            for r in bm25_rank(df, query, k=10).collect()
        ]

        k1, b = 1.2, 0.75
        docs = {i: t.split() for i, t in rows}
        n_docs = len(docs)
        avgdl = sum(len(t) for t in docs.values()) / n_docs
        dfreq = {
            q: sum(1 for t in docs.values() if q in t) for q in query
        }
        scores = {}
        for i, t in docs.items():
            s = 0.0
            for q in query:
                tf = t.count(q)
                if not tf or not dfreq[q]:
                    continue
                idf = math.log(1 + (n_docs - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
                s += round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl)), 6)
            if s:
                scores[i] = round(s, 6)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        want = [(i, s, rk + 1) for rk, (i, s) in enumerate(want)]
        assert got == want, (seed, got, want)


def test_cooccurrence_pmi_matches_python(spark):
    """cooccurrence_edges' pair counts and PMI must equal a Counter-based
    Python replica on random doc->concept sets (the same pair/marginal
    machinery q_assoc_rules' support/confidence/lift ride on)."""
    import math

    from cliner_spark.graph import cooccurrence_edges

    for seed in (23,):
        rng = random.Random(seed)
        dcui = set()
        for doc in range(80):
            for _ in range(rng.randrange(0, 5)):
                dcui.add((doc, f"C{rng.randrange(8)}"))
        rowsdf = spark.createDataFrame(
            sorted(dcui), "doc_id bigint, cui string"
        )
        # python truth
        node = Counter(c for _, c in dcui)
        docs_with = len({d for d, _ in dcui})
        by_doc = {}
        for d, c in dcui:
            by_doc.setdefault(d, set()).add(c)
        pair = Counter()
        for d, cs in by_doc.items():
            cs = sorted(cs)
            for i in range(len(cs)):
                for j in range(i + 1, len(cs)):
                    pair[(cs[i], cs[j])] += 1

        got_pmi = {
            (r["src"], r["dst"]): r["pmi"]
            for r in cooccurrence_edges(rowsdf, key="doc_id", node="cui").collect()
        }
        for (a, bb), n in pair.items():
            want = round(math.log(n * docs_with / (node[a] * node[bb])), 6)
            assert abs(got_pmi[(a, bb)] - want) < 1e-9, (a, bb)
        assert len(got_pmi) == len(pair)


def test_dsir_weights_match_python_on_random_corpora(spark):
    """lm.importance_weights must equal a straight-line Python DSIR replica
    (add-one bigram LMs, OOV fallback, fixed-point floors) on random corpora
    with deliberate target-OOV bigrams — the join/coalesce fallback path is
    where a formula restated in both engines could drift together."""
    import math

    from cliner_spark.lm import importance_weights

    vocab = [f"w{i}" for i in range(10)]
    for seed in (19, 43):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12))))
            for i in range(90)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(4)
        target = df.filter((F.col("doc_id") % 3) == 0)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["weight_fp"])
            for r in importance_weights(df, target).collect()
        }

        def bigrams(toks):
            return list(zip([t.lower() for t in toks], [t.lower() for t in toks[1:]]))

        docs = {i: t.split() for i, t in rows}
        tdocs = {i: t for i, t in docs.items() if i % 3 == 0}
        cb_b, cw_b = Counter(), Counter()
        for t in docs.values():
            for w1, w2 in bigrams(t):
                cb_b[(w1, w2)] += 1
                cw_b[w1] += 1
        # background unigram counts/vocab mirror bigram_lm: unigrams over ALL tokens
        uni_b = Counter(w.lower() for t in docs.values() for w in t)
        v_b = len(uni_b)
        cb_t, uni_t = Counter(), Counter()
        for t in tdocs.values():
            for w1, w2 in bigrams(t):
                cb_t[(w1, w2)] += 1
        for t in tdocs.values():
            for w in t:
                uni_t[w.lower()] += 1
        v_t = len(uni_t)

        FP = 10**6
        want = {}
        for i, t in docs.items():
            bs = bigrams(t)
            if not bs:
                continue
            w = 0
            for w1, w2 in bs:
                ft = math.floor(
                    math.log((cb_t.get((w1, w2), 0) + 1) / (uni_t.get(w1, 0) + v_t)) * FP
                )
                fb = math.floor(
                    math.log((cb_b[(w1, w2)] + 1) / (uni_b[w1] + v_b)) * FP
                )
                w += ft - fb
            want[i] = (len(bs), w)
        assert got == want, (seed, {k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)})
