"""Independent-oracle replica tests for the monitoring/inference batch
(q_cusum_page / q_ks_two_sample / q_logrank_test)."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_cusum_recursion_identity(spark):
    ev = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE) FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    counts = defaultdict(int)
    types, days = set(), set()
    for et, d in ev:
        counts[(et, d)] += 1
        types.add(et)
        days.add(d)
    days = sorted(days)
    rows = entry.queries()["q_cusum_page"](spark, SF).collect()
    assert len(rows) == len(types) * len(days)
    got = {(r["event_type"], r["day"]): r for r in rows}
    alarms = 0
    for et in types:
        xs = [counts.get((et, d), 0) for d in days]
        target = sum(xs) // len(days)
        s_up = s_dn = 0
        for d, x in zip(days, xs):
            z = x - target
            # the direct Page recursions
            s_up = max(0, s_up + z)
            s_dn = max(0, s_dn - z)
            r = got[(et, str(d))]
            assert (r["n"], r["target"], r["z"]) == (x, target, z)
            # window-algebraic form == sequential recursion
            assert r["cusum_up"] == s_up
            assert r["cusum_dn"] == s_dn
            assert r["alarm_up"] == (s_up > 2 * target + 5)
            assert r["alarm_dn"] == (s_dn > 2 * target + 5)
            alarms += r["alarm_up"] + r["alarm_dn"]
    # the ledger itself must be exercised (alarms may be zero on a calm
    # fixture, but CUSUM values must move)
    assert any(r["cusum_up"] > 0 for r in rows)
    assert any(r["cusum_dn"] > 0 for r in rows)


def test_ks_two_sample_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT n_chars, lang FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    c1, c2 = defaultdict(int), defaultdict(int)
    for nc, lang in docs:
        (c1 if lang == "en" else c2)[nc] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    xs = sorted(set(c1) | set(c2))
    f1 = f2 = 0
    exp = {}
    for x in xs:
        f1 += c1.get(x, 0)
        f2 += c2.get(x, 0)
        exp[x] = (c1.get(x, 0), c2.get(x, 0), f1, f2, abs(n2 * f1 - n1 * f2))
    d_max = max(v[4] for v in exp.values())
    rows = entry.queries()["q_ks_two_sample"](spark, SF).collect()
    assert len(rows) == len(xs)
    for r in rows:
        cc1, cc2, ff1, ff2, dn = exp[r["x"]]
        assert (r["c1"], r["c2"], r["f1"], r["f2"]) == (cc1, cc2, ff1, ff2)
        assert (r["n1"], r["n2"], r["d_num"], r["d_den"]) == (n1, n2, dn, n1 * n2)
        assert r["is_ks_argmax"] == (dn == d_max)
    # non-vacuity: both samples populated, the KS gap is strictly positive
    assert n1 > 0 and n2 > 0 and d_max > 0
    assert sum(r["is_ks_argmax"] for r in rows) >= 1


def test_logrank_matches_replica_and_symmetry(spark):
    ev = duckdb.sql(
        f"SELECT user_id, event_type, CAST(ts AS DATE), round(value*100) "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    t0, t1, td = {}, {}, {}
    for u, et, d, cents in ev:
        t0[u] = min(t0.get(u, d), d)
        t1[u] = max(t1.get(u, d), d)
        if et == "purchase" and cents >= 19000:
            td[u] = min(td.get(u, d), d)
    life = []
    for u in t0:
        grp = int(hashlib.md5(f"trt:{u}".encode()).hexdigest()[0], 16) % 2
        if u in td:
            life.append((grp, (td[u] - t0[u]).days, 0))
        else:
            life.append((grp, (t1[u] - t0[u]).days, 1))
    death_times = sorted({t for _, t, c in life if c == 0})
    rows = {r["t_days"]: r for r in entry.queries()["q_logrank_test"](spark, SF).collect()}
    assert set(rows) == set(death_times)
    oe_sum_1 = oe_sum_0 = Fraction(0)
    for t in death_times:
        n1 = sum(1 for g, tt, _ in life if g == 1 and tt >= t)
        n0 = sum(1 for g, tt, _ in life if g == 0 and tt >= t)
        d1 = sum(1 for g, tt, c in life if g == 1 and tt == t and c == 0)
        d0 = sum(1 for g, tt, c in life if g == 0 and tt == t and c == 0)
        n, d = n1 + n0, d1 + d0
        r = rows[t]
        assert (r["n1_risk"], r["n0_risk"], r["d1"], r["d0"]) == (n1, n0, d1, d0)
        assert (r["oe_num"], r["oe_den"]) == (n * d1 - d * n1, n)
        assert r["var_num"] == d * (n - d) * n1 * n0
        assert r["var_den"] == (n * n * (n - 1) if n > 1 else None)
        oe_sum_1 += Fraction(n * d1 - d * n1, n)
        oe_sum_0 += Fraction(n * d0 - d * n0, n)
    # arm symmetry: sum(O1-E1) == -sum(O0-E0), exactly
    assert oe_sum_1 == -oe_sum_0
    # fixture non-vacuity: real deaths, real censoring, both arms at risk
    assert death_times
    assert any(c == 1 for _, _, c in life)
    assert any(g == 1 for g, _, _ in life) and any(g == 0 for g, _, _ in life)
