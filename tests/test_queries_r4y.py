"""Independent-oracle replica tests for the estimation + coverage batch
(q_german_tank / q_good_turing / q_set_cover_greedy)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, coalesce(text,'') FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_german_tank_matches_replica(spark):
    ids = [d for d, _ in _docs()]
    n_true = len(ids)
    rows = {r["thr_nibbles"]: r for r in entry.queries()["q_german_tank"](spark, SF).collect()}
    assert set(rows) == {1, 2, 4, 8}
    prev_err = None
    for thr in (1, 2, 4, 8):
        samp = [
            d for d in ids
            if int(hashlib.md5(f"gt:{d}".encode()).hexdigest()[0], 16) < thr
        ]
        k, m1 = len(samp), max(samp) + 1
        r = rows[thr]
        assert (r["k"], r["m1"], r["n_true"]) == (k, m1, n_true)
        assert (r["est_num"], r["est_den"]) == (m1 * (k + 1) - k, k)
        assert r["abs_err_num"] == abs(n_true * k - (m1 * (k + 1) - k))
        prev_err = r["abs_err_num"]
    # estimator sanity at the largest sample: within a few percent
    r = rows[8]
    assert abs(r["est_num"] / r["est_den"] - n_true) / n_true < 0.05
    _ = prev_err


def test_good_turing_matches_replica(spark):
    counts = Counter()
    for _, text in _docs():
        counts.update(t.lower() for t in text.strip().split())
    nr = Counter(counts.values())
    n_tokens = sum(counts.values())
    rows = {r["r"]: r for r in entry.queries()["q_good_turing"](spark, SF).collect()}
    # spine = the r=0 unseen row + the 10 smallest OCCUPIED counts
    expected_rs = {0} | set(sorted(nr)[:10])
    assert set(rows) == expected_rs
    for r in sorted(expected_rs):
        row = rows[r]
        assert row["n_r"] == nr.get(r, 0)
        assert row["next_n_r"] == nr.get(r + 1, 0)
        assert row["mass_r"] == r * nr.get(r, 0)
        if nr.get(r, 0) > 0:
            assert row["r_star_num"] == (r + 1) * nr.get(r + 1, 0)
            assert row["r_star_den"] == nr.get(r, 0)
        else:
            assert row["r_star_num"] is None and row["r_star_den"] is None
        assert row["n_tokens"] == n_tokens
    assert rows[0]["p_unseen"] == round(nr.get(1, 0) / n_tokens, 6)
    # every non-zero spine row is a real occupied bucket
    assert all(rows[r]["n_r"] > 0 for r in expected_rs if r != 0)


def test_set_cover_greedy_matches_replica(spark):
    toksets = {}
    for d, text in _docs():
        toks = [t.lower() for t in text.strip().split()]
        toksets[d] = {
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        }
    vocab = set().union(*toksets.values())
    covered: set = set()
    exp = []
    for k in range(1, 7):
        if covered == vocab:
            exp.append((k, None, None, len(covered)))
            continue
        best = max(
            toksets,
            key=lambda d: (len(toksets[d] - covered), -d),
        )
        gain = len(toksets[best] - covered)
        covered |= toksets[best]
        exp.append((k, best, gain, len(covered)))
    rows = sorted(
        entry.queries()["q_set_cover_greedy"](spark, SF).collect(),
        key=lambda r: r["round"],
    )
    assert len(rows) == 6
    prev_gain = None
    for (k, doc, gain, cum), r in zip(exp, rows):
        assert (r["round"], r["doc_id"], r["gain"], r["cum_covered"]) == (
            k, doc, gain, cum,
        )
        assert r["n_vocab"] == len(vocab)
        # greedy gains are non-increasing (until/unless exhausted)
        if prev_gain is not None and r["gain"] is not None:
            assert r["gain"] <= prev_gain
        prev_gain = r["gain"] if r["gain"] is not None else prev_gain
    # coverage grows and stays below/at vocab
    assert rows[-1]["cum_covered"] <= len(vocab)
    assert rows[-1]["cum_covered"] > rows[0]["cum_covered"]
