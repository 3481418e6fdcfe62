"""Independent-oracle replica tests for the survey-calibration batch
(q_ipf_raking / q_horvitz_thompson / q_hamilton_apportionment)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
FP = 1 << 16
B = 997


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, lang, n_chars "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_ipf_raking_matches_integer_replica(spark):
    docs = _docs()
    n = Counter((s, l) for _, s, l, _ in docs)
    sources = sorted({s for _, s, _, _ in docs})
    langs = sorted({l for _, _, l, _ in docs})
    n_total, n_src, n_lang = len(docs), len(sources), len(langs)
    w = {(s, l): FP for s in sources for l in langs}
    for _ in range(3):
        for margin, dim in (("source", n_src), ("lang", n_lang)):
            sums = defaultdict(int)
            for (s, l), wv in w.items():
                sums[s if margin == "source" else l] += n[(s, l)] * wv
            w = {
                (s, l): (wv * n_total * FP)
                // (dim * sums[s if margin == "source" else l])
                for (s, l), wv in w.items()
            }
    rows = entry.queries()["q_ipf_raking"](spark, SF).collect()
    assert len(rows) == n_src * n_lang
    row_sums = defaultdict(int)
    for (s, l), wv in w.items():
        row_sums[s] += n[(s, l)] * wv
    for r in rows:
        key = (r["source"], r["lang"])
        assert r["n"] == n[key]
        assert r["w_fp"] == w[key]
        assert r["weighted_fp"] == n[key] * w[key]
        assert r["row_sum_fp"] == row_sums[r["source"]]
    # raking actually moved weights: the fixture mix is not uniform
    assert any(r["w_fp"] != FP for r in rows)
    # after the final column sweep every column margin is within floor
    # error of the uniform target n_total*FP/n_lang
    col_sums = defaultdict(int)
    for (s, l), wv in w.items():
        col_sums[l] += n[(s, l)] * wv
    target = n_total * FP / n_lang
    for l in langs:
        assert abs(col_sums[l] - target) / target < 1e-3


def test_horvitz_thompson_matches_replica(spark):
    docs = _docs()
    led = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, n_s, true, ht_num, var_num
    classes_seen = set()
    for doc_id, source, _, nc in docs:
        cls = 0 if nc < 200 else (1 if nc < 400 else 2)
        classes_seen.add(cls)
        nib = int(hashlib.md5(f"ht:{doc_id}".encode()).hexdigest()[0], 16)
        samp = 1 if nib < 4 * (cls + 1) else 0
        m3 = {0: 12, 1: 6, 2: 4}[cls]
        v9 = {0: 108, 1: 18, 2: 4}[cls]
        row = led[source]
        row[0] += 1
        row[1] += samp
        row[2] += nc
        if samp:
            row[3] += nc * m3
            row[4] += nc * nc * v9
    rows = entry.queries()["q_horvitz_thompson"](spark, SF).collect()
    assert len(rows) == len(led)
    for r in rows:
        n, ns, true, ht, var = led[r["source"]]
        assert (r["n_pop"], r["n_sampled"], r["true_chars"]) == (n, ns, true)
        assert (r["ht_num"], r["ht_den"]) == (ht, 3)
        assert r["abs_err_num"] == abs(3 * true - ht)
        assert (r["var_num"], r["var_den"]) == (var, 9)
    # fixture non-vacuity: all three length classes occur, sampling is
    # neither empty nor total, and some estimate misses truth
    assert classes_seen == {0, 1, 2}
    assert any(0 < r["n_sampled"] < r["n_pop"] for r in rows)
    assert any(r["abs_err_num"] > 0 for r in rows)


def test_hamilton_apportionment_quota_property(spark):
    docs = _docs()
    y = defaultdict(int)
    for _, source, _, nc in docs:
        y[source] += nc
    n_total = sum(y.values())
    base = {s: (B * v) // n_total for s, v in y.items()}
    rem = {s: (B * v) % n_total for s, v in y.items()}
    k = B - sum(base.values())
    order = sorted(y, key=lambda s: (-rem[s], s))
    extras = set(order[:k])
    rows = entry.queries()["q_hamilton_apportionment"](spark, SF).collect()
    assert len(rows) == len(y)
    total = 0
    for r in rows:
        s = r["source"]
        assert (r["y_chars"], r["base"], r["rem"]) == (y[s], base[s], rem[s])
        assert r["extra"] == (1 if s in extras else 0)
        assert r["alloc"] == base[s] + r["extra"]
        # quota property: alloc within +/-1 of the exact quota B*y/N
        assert r["base"] <= r["alloc"] <= r["base"] + 1
        assert abs(r["alloc"] - B * y[s] / n_total) < 1
        total += r["alloc"]
    assert total == B
    # remainder ranking was actually exercised (budget is prime)
    assert 0 < k < len(y)
