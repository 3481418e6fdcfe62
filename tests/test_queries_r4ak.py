"""Independent-oracle replica tests for the query-optimizer batch
(q_join_cardinality / q_join_order_cost / q_partition_advisor): estimates
recomputed from raw tables, the FK q-error ~ 1 property, plan-regret
reconstruction, and partition-metric replay."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _one(sql):
    return duckdb.sql(sql).fetchone()[0]


def test_join_cardinality_matches_replica(spark):
    t = {n: f"read_parquet('{SF}/{n}.parquet')" for n in ("orders", "customer", "lineitem", "part")}
    edges = {
        "orders_customer": ("orders", "customer", "o_custkey", "c_custkey"),
        "lineitem_orders": ("lineitem", "orders", "l_orderkey", "o_orderkey"),
        "lineitem_part": ("lineitem", "part", "l_partkey", "p_partkey"),
    }
    got = {r["join_name"]: r for r in entry.queries()["q_join_cardinality"](spark, SF).collect()}
    assert set(got) == set(edges)
    for name, (a, b, ka, kb) in edges.items():
        na = _one(f"SELECT count(*) FROM {t[a]}")
        nb = _one(f"SELECT count(*) FROM {t[b]}")
        da = _one(f"SELECT count(DISTINCT {ka}) FROM {t[a]}")
        db = _one(f"SELECT count(DISTINCT {kb}) FROM {t[b]}")
        actual = _one(
            f"SELECT count(*) FROM {t[a]} a JOIN {t[b]} b ON a.{ka} = b.{kb}"
        )
        r = got[name]
        assert (r["n_left"], r["n_right"], r["d_left"], r["d_right"]) == (na, nb, da, db)
        assert (r["est_num"], r["est_den"]) == (na * nb, max(da, db))
        assert r["actual"] == actual
        est = na * nb / max(da, db)
        assert math.isclose(r["est_rows"], round(est, 4), abs_tol=1e-6)
        q = max(est / actual, actual / est)
        assert math.isclose(r["q_error"], round(q, 6), abs_tol=1e-6)
        # FK joins under containment: the System-R estimate is near-exact
        assert r["q_error"] < 1.2


def test_join_order_cost_matches_replica(spark):
    o = f"read_parquet('{SF}/orders.parquet')"
    c = f"read_parquet('{SF}/customer.parquet')"
    li = f"read_parquet('{SF}/lineitem.parquet')"
    n_c, n_o, n_l = (_one(f"SELECT count(*) FROM {x}") for x in (c, o, li))
    n_of = _one(f"SELECT count(*) FROM {o} WHERE o_orderstatus = 'F'")
    d_cc = _one(f"SELECT count(DISTINCT c_custkey) FROM {c}")
    d_oc = _one(f"SELECT count(DISTINCT o_custkey) FROM {o}")
    d_ok = _one(f"SELECT count(DISTINCT o_orderkey) FROM {o}")
    d_lk = _one(f"SELECT count(DISTINCT l_orderkey) FROM {li}")
    a_co = _one(f"SELECT count(*) FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey")
    a_ol = _one(f"SELECT count(*) FROM {o} o JOIN {li} l ON o.o_orderkey = l.l_orderkey")
    a_col = _one(
        f"SELECT count(*) FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey "
        f"JOIN {li} l ON o.o_orderkey = l.l_orderkey"
    )
    a_ofl = _one(
        f"SELECT count(*) FROM {o} o JOIN {li} l ON o.o_orderkey = l.l_orderkey "
        f"WHERE o.o_orderstatus = 'F'"
    )
    a_ofcl = _one(
        f"SELECT count(*) FROM {c} c JOIN {o} o ON c.c_custkey = o.o_custkey "
        f"JOIN {li} l ON o.o_orderkey = l.l_orderkey WHERE o.o_orderstatus = 'F'"
    )
    e_co = n_c * n_o / max(d_cc, d_oc)
    e_ol = n_o * n_l / max(d_ok, d_lk)
    e_ofl = n_of * n_l / max(d_ok, d_lk)
    plans = {
        "co_then_l": (e_co + e_co * n_l / max(d_ok, d_lk), a_co + a_col),
        "ol_then_c": (e_ol + e_ol * n_c / max(d_oc, d_cc), a_ol + a_col),
        "filtered_ofl_then_c": (
            e_ofl + e_ofl * n_c / max(d_oc, d_cc), a_ofl + a_ofcl,
        ),
    }
    best_actual = min(a for _e, a in plans.values())
    picked = min(plans, key=lambda p: (plans[p][0], p))
    got = {r["plan"]: r for r in entry.queries()["q_join_order_cost"](spark, SF).collect()}
    assert set(got) == set(plans)
    for p, (e, a) in plans.items():
        r = got[p]
        assert math.isclose(r["est_cost"], round(e, 4), abs_tol=1e-6)
        assert r["actual_cost"] == a
        assert r["picked"] == (1 if p == picked else 0)
        assert r["best_actual"] == best_actual
        assert math.isclose(r["cost_vs_best"], round(a / best_actual, 6), abs_tol=1e-6)
    # the pushdown plan must be cheapest in BOTH estimate and reality
    assert picked == "filtered_ofl_then_c"
    assert got[picked]["cost_vs_best"] == 1.0


def test_partition_advisor_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), user_id % 64, "
        f"date_trunc('hour', ts) FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    cands = {
        "event_type": Counter(str(r[0]) for r in rows),
        "day": Counter(str(r[1]) for r in rows),
        "user_bucket": Counter(str(r[2]) for r in rows),
        "hour": Counter(str(r[3]) for r in rows),
    }
    got = {r["cand"]: r for r in entry.queries()["q_partition_advisor"](spark, SF).collect()}
    assert set(got) == set(cands)
    for cand, cnt in cands.items():
        r = got[cand]
        n_rows = sum(cnt.values())
        assert (r["n_partitions"], r["n_rows"]) == (len(cnt), n_rows)
        assert (r["max_rows"], r["min_rows"]) == (max(cnt.values()), min(cnt.values()))
        assert r["n_small"] == sum(1 for v in cnt.values() if v < 64)
        assert (r["skew_num"], r["skew_den"]) == (max(cnt.values()) * len(cnt), n_rows)
        assert math.isclose(
            r["skew_ratio"], round(max(cnt.values()) * len(cnt) / n_rows, 6),
            abs_tol=1e-9,
        )
        assert r["avg_in_band"] == (1 if 64 <= n_rows // len(cnt) <= 8192 else 0)
        # skew ratio >= 1 always, == 1 only if perfectly even
        assert r["skew_ratio"] >= 1.0
    # finer keys -> more partitions, monotone sanity across the ladder
    assert got["hour"]["n_partitions"] >= got["day"]["n_partitions"]
