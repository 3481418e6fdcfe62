"""Independent-oracle replica tests for the labeled-embedding batch
(q_knn_loo_eval / q_cluster_separation / q_kmeans_inertia), incl. the
exact Huygens decomposition identity."""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _vecs(scale):
    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    out = []
    for vid, lab, emb in rows:
        out.append((vid, lab, [round(float(x) * scale) for x in emb]))
    return out


def test_knn_loo_eval_matches_replica(spark):
    vecs = _vecs(1_000_000)
    per_label = defaultdict(lambda: [0, 0])
    for vid, lab, q in vecs:
        dists = []
        for nid, nlab, nq in vecs:
            if nid == vid:
                continue
            d2 = sum((a - b) * (a - b) for a, b in zip(q, nq))
            dists.append((d2, nid, nlab))
        dists.sort()
        votes = Counter(nl for _, _, nl in dists[:5])
        best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        per_label[lab][0] += 1
        per_label[lab][1] += best == lab
    rows = {r["true_label"]: r for r in entry.queries()["q_knn_loo_eval"](spark, SF).collect()}
    assert set(rows) == set(per_label)
    for lab, (n, nc) in per_label.items():
        assert (rows[lab]["n"], rows[lab]["n_correct"]) == (n, nc)
    # this fixture's labels are INDEPENDENT of the embeddings, so LOO
    # accuracy must sit at the 10% chance floor — the benchmark correctly
    # reporting unlearnable labels IS the expected outcome here
    total = sum(v[0] for v in per_label.values())
    correct = sum(v[1] for v in per_label.values())
    assert 0.02 < correct / total < 0.25


def test_cluster_separation_matches_bruteforce(spark):
    vecs = _vecs(1000)
    by_label = defaultdict(list)
    for _, lab, q in vecs:
        by_label[lab].append(q)
    rows = {(r["label_a"], r["label_b"]): r for r in entry.queries()["q_cluster_separation"](spark, SF).collect()}
    labels = sorted(by_label)
    assert set(rows) == {(a, b) for a in labels for b in labels}
    for la in labels:
        for lb in labels:
            brute = sum(
                sum((x - y) * (x - y) for x, y in zip(qa, qb))
                for qa in by_label[la]
                for qb in by_label[lb]
                if la != lb or qa is not qb
            )
            r = rows[(la, lb)]
            na, nb = len(by_label[la]), len(by_label[lb])
            assert (r["n_a"], r["n_b"]) == (na, nb)
            assert r["sum_d2"] == brute
            assert r["n_pairs"] == (na * (na - 1) if la == lb else na * nb)
    # with label-independent embeddings the matrix must be near-isotropic
    # (no real separation) but exactly symmetric — both are checked
    for la in labels:
        for lb in labels:
            assert rows[(la, lb)]["sum_d2"] == rows[(lb, la)]["sum_d2"]
            assert rows[(la, lb)]["sum_d2"] > 0
    within = [Fraction(rows[(la, la)]["sum_d2"], rows[(la, la)]["n_pairs"]) for la in labels]
    cross = [
        Fraction(rows[(la, lb)]["sum_d2"], rows[(la, lb)]["n_pairs"])
        for la in labels for lb in labels if la != lb
    ]
    assert max(cross) / min(within) < Fraction(3, 2)


def test_kmeans_inertia_huygens_identity(spark):
    vecs = _vecs(1000)
    rows = {r["label"]: r for r in entry.queries()["q_kmeans_inertia"](spark, SF).collect()}
    by_label = defaultdict(list)
    for _, lab, q in vecs:
        by_label[lab].append(q)
    for lab, qs in by_label.items():
        n = len(qs)
        ss = sum(x * x for q in qs for x in q)
        s = [sum(col) for col in zip(*qs)]
        r = rows[lab]
        assert (r["n"], r["ss"], r["s_norm2"]) == (n, ss, sum(v * v for v in s))
        assert r["within_num"] == n * ss - sum(v * v for v in s)
    # exact Huygens decomposition: total inertia around the global mean
    # equals sum of withins plus between, in Fractions
    any_row = next(iter(rows.values()))
    n_all, ss_all, t_norm2 = any_row["n_all"], any_row["ss_all"], any_row["t_norm2"]
    total = Fraction(n_all * ss_all - t_norm2, n_all)
    within_sum = sum(Fraction(r["within_num"], r["within_den"]) for r in rows.values())
    between = sum(
        Fraction(r["s_norm2"], r["n"]) for r in rows.values()
    ) - Fraction(t_norm2, n_all)
    assert total == within_sum + between
    assert between > 0
