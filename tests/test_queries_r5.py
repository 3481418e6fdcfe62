"""Independent-oracle replica tests for the round-5 batch: q_gif_decode
(analytic pixel stats vs the real GIF encode->LZW->decode roundtrip) and
q_knn_loo_ann (full seeded-IVF LOO 5-NN replay), plus the round-4 verdict
item 3 agreement audit of the ANN eval against the brute-force gate."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import numpy as np

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_gif_decode_matches_analytic_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, text in docs:
        w = 4 + did % 5
        h = 3 + did % 4
        n = w * h * 3
        digest = hashlib.md5(text.encode("utf-8")).digest()
        stream = (digest * ((n + 15) // 16))[:n]
        want[did] = (
            w, h, n,
            hashlib.sha256(stream.hex().encode("ascii")).hexdigest(),
            sum(stream[0::3]), sum(stream[1::3]), sum(stream[2::3]),
        )
    got = entry.queries()["q_gif_decode"](spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        w, h, n, sha, sr, sg, sb = want[r["media_id"]]
        assert r["fmt"] == "gif"
        assert (r["width"], r["height"], r["n_px_bytes"]) == (w, h, n)
        assert r["px_sha256"] == sha
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sr, sg, sb)


def _embeddings():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding::DOUBLE[], label FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    vecs = np.asarray([r[1] for r in rows], dtype=np.float64)
    labels = np.asarray([r[2] for r in rows], dtype=np.int64)
    return ids, vecs, labels


def _knn_predictions(ids, vecs, labels, cand_of):
    """LOO 5-NN vote over micro-unit d2 with the registry's exact pins:
    (d2, nid) neighbor rank, (count desc, label asc) vote."""
    q = np.round(vecs * 1e6).astype(np.int64)
    pred = {}
    for qi, qid in enumerate(ids):
        cands = cand_of(qi)
        d2 = [
            (int(((q[qi] - q[ci]) ** 2).sum()), int(ids[ci]), int(labels[ci]))
            for ci in cands
        ]
        d2.sort()
        top = d2[:5]
        votes = Counter(lab for _d, _n, lab in top)
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        pred[int(qid)] = best
    return pred


def _seeded_probe_cells(ids, vecs, n_lists=16, n_probe=4):
    order = sorted(range(len(ids)), key=lambda i: (_md5(str(ids[i])), ids[i]))
    seeds = [vecs[i] for i in order[:n_lists]]

    def cos6(a, b):
        return round(
            float(a @ b) / np.sqrt(float(a @ a) * float(b @ b)), 6
        )

    cells = np.empty(len(ids), dtype=np.int64)
    probes = []
    for i in range(len(ids)):
        sims = sorted(
            ((-cos6(vecs[i], s), c) for c, s in enumerate(seeds))
        )
        cells[i] = sims[0][1]
        probes.append([c for _s, c in sims[:n_probe]])
    return cells, probes


def test_knn_loo_ann_matches_replica_and_agrees_with_exact_gate(spark):
    ids, vecs, labels = _embeddings()
    cells, probes = _seeded_probe_cells(ids, vecs)

    members = {}
    for i, c in enumerate(cells):
        members.setdefault(int(c), []).append(i)

    def ann_cands(qi):
        return [
            ci
            for c in probes[qi]
            for ci in members.get(int(c), [])
            if ci != qi
        ]

    ann_pred = _knn_predictions(ids, vecs, labels, ann_cands)
    n_cand = {int(ids[qi]): len(ann_cands(qi)) for qi in range(len(ids))}

    # per-label ledger replica vs the registered query
    got = {
        r["true_label"]: r
        for r in entry.queries()["q_knn_loo_ann"](spark, SF).collect()
    }
    per = {}
    for qi, qid in enumerate(ids):
        lab = int(labels[qi])
        n, ok, s_c, m_c = per.get(lab, (0, 0, 0, None))
        nc = n_cand[int(qid)]
        per[lab] = (
            n + 1,
            ok + (1 if ann_pred[int(qid)] == lab else 0),
            s_c + nc,
            nc if m_c is None else min(m_c, nc),
        )
    assert set(got) == set(per)
    for lab, (n, ok, s_c, m_c) in per.items():
        r = got[lab]
        assert (r["n"], r["n_correct"]) == (n, ok)
        assert abs(r["accuracy"] - round(ok / n, 6)) < 1e-9
        assert r["min_cands"] == m_c
        assert abs(r["avg_cands"] - round(s_c / n, 6)) < 1e-9

    # round-4 verdict item 3: agreement audit vs the brute-force gate —
    # same voting algebra over the FULL candidate set
    exact_pred = _knn_predictions(
        ids, vecs, labels,
        lambda qi: [ci for ci in range(len(ids)) if ci != qi],
    )
    agree = sum(
        1 for k in exact_pred if exact_pred[k] == ann_pred[k]
    ) / len(exact_pred)
    # On THIS fixture the vectors are random, so exact 5-NN neighborhoods
    # are near-arbitrary and pruning to 4/16 cells (~25% of pairs) can
    # legitimately flip many votes — the honest bar is agreement FAR above
    # what two unrelated predictors with these label marginals would
    # produce by chance, not a fixed high fraction (clustered real
    # embeddings agree much higher because true neighbors concentrate in
    # the probed cells).
    pe = Counter(exact_pred.values())
    pa = Counter(ann_pred.values())
    n_q = len(exact_pred)
    chance_agree = sum(
        (pe[lab] / n_q) * (pa[lab] / n_q) for lab in set(pe) | set(pa)
    )
    print(
        f"ann-vs-exact prediction agreement: {agree:.3f} "
        f"(chance {chance_agree:.3f})"
    )
    assert agree > 2.5 * chance_agree, (agree, chance_agree)
    assert agree > 0.3, agree
    # labels are random on this fixture: accuracy must sit at chance for
    # BOTH evals (an ANN shortcut must not hallucinate signal)
    acc_ann = sum(
        1 for qi, qid in enumerate(ids) if ann_pred[int(qid)] == labels[qi]
    ) / len(ids)
    assert acc_ann < 0.25, acc_ann


def test_jpeg_decode_matches_analytic_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    want = {}
    for did, text in docs:
        wb, hb = 1 + did % 2, 1 + did % 3
        w, h = 8 * wb, 8 * hb
        digest = hashlib.md5(text.encode("utf-8")).digest()
        colors = (digest * 3)[: 3 * wb * hb]
        stream = bytearray()
        for y in range(h):
            for x in range(w):
                bi = (y // 8) * wb + (x // 8)
                stream += colors[3 * bi : 3 * bi + 3]
        stream = bytes(stream)
        want[did] = (
            w, h, len(stream),
            hashlib.sha256(stream.hex().encode("ascii")).hexdigest(),
            sum(stream[0::3]), sum(stream[1::3]), sum(stream[2::3]),
        )
    got = entry.queries()["q_jpeg_decode"](spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        w, h, n, sha, sr, sg, sb = want[r["media_id"]]
        assert r["fmt"] == "jpeg"
        assert (r["width"], r["height"], r["n_px_bytes"]) == (w, h, n)
        assert r["px_sha256"] == sha
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sr, sg, sb)
