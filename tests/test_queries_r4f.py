"""Independent-oracle property tests for the round-4q batch: python
replicas of the source ANOVA, the seeded sign-flip permutation test, the
ordered 2-sequence support miner, and the k-fold balance audit."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return entry.queries()[name](spark, SF)


def test_anova_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    groups = defaultdict(list)
    for s, n in rows:
        groups[s].append(n)
    nn = sum(len(v) for v in groups.values())
    tt = sum(sum(v) for v in groups.values())
    ss = sum(x * x for v in groups.values() for x in v)
    k = len(groups)
    mean = tt / nn
    ssb = sum(len(v) * (sum(v) / len(v) - mean) ** 2 for v in groups.values())
    sstot = ss - tt * tt / nn
    f = (ssb / (k - 1)) / ((sstot - ssb) / (nn - k))
    got = {r["source"]: r for r in (x.asDict() for x in _q(spark, "q_anova_sources").collect())}
    assert set(got) == set(groups)
    for s, r in got.items():
        v = groups[s]
        assert r["n_g"] == len(v)
        assert r["sum_g"] == sum(v)
        assert r["sumsq_g"] == sum(x * x for x in v)
        assert r["ssb_num"] == (nn * sum(v) - len(v) * tt) ** 2
        assert r["ssb_den"] == nn * nn * len(v)
        assert abs(r["ss_between"] - ssb) < 1e-3
        assert abs(r["f_stat"] - f) < 1e-4


def test_permutation_test_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, "
        f"sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)"
        f" - sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).fetchall()
    diffs = {u: d for u, d in rows}
    t_obs = abs(sum(diffs.values()))
    tb = {}
    for b in range(64):
        s = 0
        for u, d in diffs.items():
            nib = int(hashlib.md5(f"{b}#{u}".encode()).hexdigest()[0], 16)
            s += d if nib % 2 == 0 else -d
        tb[b] = abs(s)
    p_num = 1 + sum(1 for v in tb.values() if v >= t_obs)
    got = {r["b"]: r for r in (x.asDict() for x in _q(spark, "q_permutation_test").collect())}
    assert len(got) == 64
    for b, r in got.items():
        assert r["t_b"] == tb[b]
        assert r["t_obs"] == t_obs
        assert r["ge_obs"] == (tb[b] >= t_obs)
        assert r["p_num"] == p_num
        assert r["p_den"] == 65
        assert abs(r["p_value"] - p_num / 65) < 1e-6
    # replicas actually vary (the coins are not degenerate)
    assert len(set(tb.values())) > 1


def test_seq2_support_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    mn, mx = {}, {}
    users = set()
    for u, t, ts in rows:
        users.add(u)
        if (u, t) not in mn or ts < mn[(u, t)]:
            mn[(u, t)] = ts
        if (u, t) not in mx or ts > mx[(u, t)]:
            mx[(u, t)] = ts
    types = sorted({t for _u, t in mn})
    per_user = defaultdict(set)
    for u, t in mn:
        per_user[u].add(t)
    n_t = Counter(t for _u, t in mn)
    got = {(r["a"], r["b"]): r for r in (x.asDict() for x in _q(spark, "q_seq2_support").collect())}
    for a in types:
        for b in types:
            if a == b:
                continue
            both = [u for u in per_user if a in per_user[u] and b in per_user[u]]
            seq = [u for u in both if mn[(u, a)] < mx[(u, b)]]
            if not both:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_both"] == len(both)
            assert r["n_seq"] == len(seq)
            assert r["n_a"] == n_t[a] and r["n_b"] == n_t[b]
            assert r["n_users"] == len(users)
            lift = len(seq) * len(users) / (n_t[a] * n_t[b])
            assert abs(r["lift"] - lift) < 1e-5
    # sequence support is never above co-presence support
    for r in got.values():
        assert r["n_seq"] <= r["n_both"]


def test_kfold_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    cells = Counter()
    n_lang = Counter()
    for d, lang in rows:
        fold = int(hashlib.md5(str(d).encode()).hexdigest()[0], 16) % 5
        cells[(lang, fold)] += 1
        n_lang[lang] += 1
    got = {(r["lang"], r["fold"]): r for r in (x.asDict() for x in _q(spark, "q_kfold_assignment").collect())}
    assert len(got) == len(n_lang) * 5
    for (lang, fold), r in got.items():
        n = cells.get((lang, fold), 0)
        assert r["n"] == n
        assert r["n_lang"] == n_lang[lang]
        assert r["dev_num"] == abs(5 * n - n_lang[lang])
    # every doc landed in exactly one fold
    assert sum(r["n"] for r in got.values()) == len(rows)
