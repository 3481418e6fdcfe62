"""CRF training path (SURVEY.md §2.9 M1, round-3 verdict item 3):
forward–backward vs brute-force enumeration, exact-gradient checks, fixture
P/R contract, and distributed-gradient == local-gradient equivalence."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from cliner_spark import crf, fixtures, oracle_py, tagger
from cliner_spark.chunk import chunk_flat_tags


def _legal_paths(T: int, trans: np.ndarray):
    L = tagger.L
    for path in itertools.product(range(L), repeat=T):
        if trans[0, path[0]] <= tagger.NEG / 2:  # no I-* start
            continue
        if any(
            trans[path[t - 1], path[t]] <= tagger.NEG / 2 for t in range(1, T)
        ):
            continue
        yield path


def test_forward_backward_matches_brute_force():
    """logZ and unary marginals vs O(L^T) enumeration over legal paths."""
    rng = np.random.default_rng(7)
    trans = tagger.iob_transitions()
    L = tagger.L
    for _ in range(12):
        T = int(rng.integers(1, 5))
        em = rng.normal(size=(T, L)).astype(np.float64)
        marg, logZ = crf.crf_forward_backward(em, np.asarray([T]), trans)

        scores = {}
        for path in _legal_paths(T, trans):
            s = sum(em[t, path[t]] for t in range(T))
            s += sum(trans[path[t - 1], path[t]] for t in range(1, T))
            scores[path] = s
        mx = max(scores.values())
        Z = sum(np.exp(s - mx) for s in scores.values())
        want_logZ = mx + np.log(Z)
        assert np.isclose(logZ[0], want_logZ, atol=1e-8), (logZ[0], want_logZ)

        want_marg = np.zeros((T, L))
        for path, s in scores.items():
            p = np.exp(s - mx) / Z
            for t, lab in enumerate(path):
                want_marg[t, lab] += p
        assert np.allclose(marg, want_marg, atol=1e-8)


def test_forward_backward_ragged_batch_equals_singletons():
    rng = np.random.default_rng(3)
    trans = tagger.iob_transitions()
    lengths = np.asarray([4, 1, 6, 2])
    em = rng.normal(size=(int(lengths.sum()), tagger.L)).astype(np.float64)
    marg_b, logZ_b = crf.crf_forward_backward(em, lengths, trans)
    off = 0
    for i, l in enumerate(lengths):
        m1, z1 = crf.crf_forward_backward(
            em[off : off + l], np.asarray([l]), trans
        )
        assert np.allclose(marg_b[off : off + l], m1, atol=1e-10)
        assert np.isclose(logZ_b[i], z1[0], atol=1e-10)
        off += l


def _fixture_texts_gold(n_convs=15, seed=11):
    term_type = tagger.best_term_type(fixtures.CLINICAL_GAZETTEER)
    rows = fixtures.gen_transcripts(n_convs=n_convs, avg_turns=6, seed=seed)
    texts, gold = [], []
    for r in rows:
        toks = r["text"].split()
        tags = ["O"] * len(toks)
        for (s, e, mt) in oracle_py.scan_mentions(r["text"], set(term_type)):
            ty = term_type[mt.lower()]
            tags[s] = f"B-{ty}"
            for i in range(s + 1, e + 1):
                tags[i] = f"I-{ty}"
        texts.append(r["text"])
        gold.append(tags)
    return rows, texts, gold


def test_crf_gradient_matches_finite_differences():
    """The analytic gradient (observed − expected counts) vs central finite
    differences of the loss at a handful of touched coordinates."""
    _, texts, gold = _fixture_texts_gold(n_convs=2, seed=5)
    texts, gold = texts[:3], gold[:3]
    model = crf._fresh_base(None)
    rng = np.random.default_rng(0)
    model.W[:] = rng.normal(scale=0.01, size=model.W.shape).astype(np.float32)
    model = crf._with_w(model, model.W.astype(np.float32))

    loss, grad = crf.crf_loss_grad(texts, gold, model, l2=1e-3)
    touched = np.argwhere(np.abs(grad) > 1e-6)
    assert len(touched) > 10
    eps = 1e-3
    for fi, li in touched[:: max(1, len(touched) // 6)][:6]:
        Wp = model.W.astype(np.float64).copy()
        Wp[fi, li] += eps
        lp, _ = crf.crf_loss_grad(
            texts, gold, crf._with_w(model, Wp.astype(np.float32)), l2=1e-3
        )
        Wm = model.W.astype(np.float64).copy()
        Wm[fi, li] -= eps
        lm, _ = crf.crf_loss_grad(
            texts, gold, crf._with_w(model, Wm.astype(np.float32)), l2=1e-3
        )
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(grad[fi, li], fd, rtol=0.05, atol=5e-3), (
            grad[fi, li],
            fd,
        )


def test_crf_learns_fixture_span_pr():
    """M1 contract: a CRF-trained model (no gazetteer at decode time — the
    hashed weights carry everything) reaches span-level P/R >= 0.95 on the
    fixture corpus, the same bar as the pipeline's triple P/R contract."""
    _, texts, gold = _fixture_texts_gold()
    model = crf.train_crf(texts, gold, iters=35, lr=0.5, l2=1e-4)
    flat, turn_ids, lengths, pred = tagger.decode_texts(pd.Series(texts), model)
    g = np.concatenate([[tagger.LABEL_IDX[t] for t in ts] for ts in gold])
    assert float((pred == g).mean()) >= 0.95

    spans = chunk_flat_tags(pred, turn_ids, tagger.LABELS)
    got = set()
    if spans:
        r_, s_, e_, ty_ = spans
        got = set(zip(map(int, r_), map(int, s_), map(int, e_), ty_))
    want = set()
    for i, ts in enumerate(gold):
        j = 0
        while j < len(ts):
            if ts[j].startswith("B-"):
                ty = ts[j][2:]
                k = j
                while k + 1 < len(ts) and ts[k + 1] == f"I-{ty}":
                    k += 1
                want.add((i, j, k, ty))
                j = k + 1
            else:
                j += 1
    assert len(want) > 100
    prec = len(got & want) / max(len(got), 1)
    rec = len(got & want) / max(len(want), 1)
    assert prec >= 0.95, (prec, rec)
    assert rec >= 0.95, (prec, rec)


def test_distributed_crf_gradient_is_exact_shard_sum(spark):
    """The conditional log-likelihood is a sum over sequences, so summing
    per-shard gradients must reproduce the single-node gradient exactly
    (float32 shard compression is the only tolerance source). This is the
    semantic difference vs perceptron parameter mixing, which approximates."""
    _, texts, gold = _fixture_texts_gold(n_convs=6, seed=2)
    model = crf._fresh_base(None)

    loss_all, grad_all = crf.crf_loss_grad(texts, gold, model, l2=0.0)
    # shard by hand into 3 chunks
    loss_sum, grad_sum = 0.0, np.zeros_like(grad_all)
    for i in range(3):
        lo, go = texts[i::3], gold[i::3]
        l, g = crf.crf_loss_grad(lo, go, model, l2=0.0)
        loss_sum += l
        grad_sum += g
    assert np.isclose(loss_all, loss_sum, rtol=1e-10)
    assert np.allclose(grad_all, grad_sum, atol=1e-8)


def test_distributed_crf_trains_fixture(spark):
    """train_crf_distributed (mapInPandas shard gradients, driver Adam)
    clears the accuracy bar without ever collecting transcripts."""
    rows, texts, gold = _fixture_texts_gold(n_convs=10, seed=11)
    term_type = tagger.best_term_type(fixtures.CLINICAL_GAZETTEER)
    tx_df = spark.createDataFrame(
        [
            {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], "text": r["text"]}
            for r in rows
        ]
    )
    gold_rows = []
    for r in rows:
        for s, e, mt in oracle_py.scan_mentions(r["text"], set(term_type)):
            gold_rows.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "tok_start": s,
                    "tok_end": e,
                    "concept_type": term_type[mt.lower()],
                }
            )
    gold_df = spark.createDataFrame(gold_rows)
    model = crf.train_crf_distributed(
        tx_df, gold_df, iters=20, lr=0.5, l2=1e-4, n_partitions=4
    )
    _, _, _, pred = tagger.decode_texts(pd.Series(texts), model)
    g = np.concatenate([[tagger.LABEL_IDX[t] for t in ts] for ts in gold])
    acc = float((pred == g).mean())
    assert acc >= 0.9, acc
