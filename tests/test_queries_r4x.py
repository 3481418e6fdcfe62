"""Independent-oracle replica tests for the analysis-governance batch
(q_simpson_paradox / q_trimmed_mean / q_runs_test)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _sign(v: int) -> int:
    return (v > 0) - (v < 0)


def test_simpson_paradox_matches_replica(spark):
    rows_ev = duckdb.sql(
        f"""SELECT e.user_id, c.c_mktsegment,
                   max(CASE WHEN e.event_type = 'purchase'
                            AND round(e.value * 100) >= 15000
                       THEN 1 ELSE 0 END)
            FROM read_parquet('{SF}/events.parquet') e
            JOIN read_parquet('{SF}/customer.parquet') c
              ON c.c_custkey = e.user_id
            GROUP BY 1, 2"""
    ).fetchall()
    cells = defaultdict(lambda: [0, 0, 0, 0])  # t_n, c_n, t_pos, c_pos
    for u, seg, pos in rows_ev:
        t = int(hashlib.md5(f"trt:{u}".encode()).hexdigest()[0], 16) % 2
        c = cells[seg]
        if t:
            c[0] += 1
            c[2] += pos
        else:
            c[1] += 1
            c[3] += pos
    agg = [sum(c[i] for c in cells.values()) for i in range(4)]
    agg_sign = _sign(agg[2] * agg[1] - agg[3] * agg[0])
    strat_signs = {
        seg: _sign(c[2] * c[1] - c[3] * c[0]) for seg, c in cells.items()
    }
    nz = [s for s in strat_signs.values() if s != 0]
    paradox = agg_sign != 0 and bool(nz) and all(s * agg_sign == -1 for s in nz)
    got = {r["seg"]: r for r in entry.queries()["q_simpson_paradox"](spark, SF).collect()}
    assert set(got) == set(cells)
    for seg, c in cells.items():
        r = got[seg]
        assert (r["t_n"], r["c_n"], r["t_pos"], r["c_pos"]) == tuple(c)
        assert r["stratum_sign"] == strat_signs[seg]
        assert (r["agg_t_n"], r["agg_c_n"]) == (agg[0], agg[1])
        assert r["agg_sign"] == agg_sign
        assert r["simpson_flag"] == paradox
    # ledger non-vacuity: conversions exist in both arms somewhere
    assert agg[2] > 0 and agg[3] > 0


def test_trimmed_mean_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_src = defaultdict(list)
    for d, s, nc in docs:
        by_src[s].append((nc, d))
    got = {r["source"]: r for r in entry.queries()["q_trimmed_mean"](spark, SF).collect()}
    for s, vals in by_src.items():
        vals.sort()
        xs = [x for x, _ in vals]
        n = len(xs)
        k = n // 20
        core = xs[k : n - k]
        r = got[s]
        assert (r["n"], r["k"], r["sum_all"]) == (n, k, sum(xs))
        assert (r["trimmed_num"], r["trimmed_den"]) == (sum(core), n - 2 * k)
        assert (r["winsor_num"], r["winsor_den"]) == (
            sum(core) + k * xs[k] + k * xs[n - k - 1], n,
        )
        # estimator ladder ordering holds trivially as exact integers
        assert r["trimmed_den"] > 0
    # trimming bites: somewhere the trimmed mean differs from the mean
    assert any(
        r["trimmed_num"] * r["n"] != r["sum_all"] * r["trimmed_den"]
        for r in got.values()
        if r["k"] > 0
    )


def test_runs_test_matches_replica(spark):
    ev = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), count(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    series = defaultdict(dict)
    for et, d, n in ev:
        series[et][d] = n
    got = {r["event_type"]: r for r in entry.queries()["q_runs_test"](spark, SF).collect()}
    assert set(got) == set(series)
    for et, days in series.items():
        xs = sorted(days.items())
        vals = sorted((x, d) for d, x in xs)
        med = vals[(len(vals) + 1) // 2 - 1][0]
        signs = [(d, 1 if x > med else 0) for d, x in xs if x != med]
        n1 = sum(s for _, s in signs)
        n2 = len(signs) - n1
        n = len(signs)
        runs = 0
        prev = None
        for _, s in signs:
            if prev is None or s != prev:
                runs += 1
            prev = s
        r = got[et]
        assert (r["n_above"], r["n_below"], r["n_runs"]) == (n1, n2, runs)
        assert (r["exp_runs_num"], r["exp_runs_den"]) == (n + 2 * n1 * n2, n)
        assert r["var_runs_num"] == 2 * n1 * n2 * (2 * n1 * n2 - n)
        assert r["var_runs_den"] == (n * n * (n - 1) if n > 1 else None)
        # runs are bounded by the dichotomy structure
        assert 1 <= runs <= n
    # the test is non-degenerate somewhere: both sides populated
    assert any(r["n_above"] > 0 and r["n_below"] > 0 for r in got.values())
