"""Independent-oracle replica tests for the causal-inference batch
(q_stratified_ate / q_did_estimator / q_cuped_adjustment), incl. the
IPW==stratified identity and the exact CUPED variance identity."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _trt(user_id: int) -> int:
    return int(hashlib.md5(f"trt:{user_id}".encode()).hexdigest()[0], 16) % 2


def _panel():
    """(user_id, seg, trt, pre_cents, post_cents) for every event user."""
    rows = duckdb.sql(
        f"""
        SELECT e.user_id, c.c_mktsegment,
               sum(CASE WHEN e.event_type = 'purchase' AND day(e.ts) < 16
                        THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END),
               sum(CASE WHEN e.event_type = 'purchase' AND day(e.ts) >= 16
                        THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END)
        FROM read_parquet('{SF}/events.parquet') e
        JOIN read_parquet('{SF}/customer.parquet') c ON c.c_custkey = e.user_id
        GROUP BY 1, 2
        """
    ).fetchall()
    return [(u, seg, _trt(u), int(x), int(y)) for u, seg, x, y in rows]


def test_stratified_ate_equals_ipw(spark):
    panel = _panel()
    got = {r["seg"]: r for r in entry.queries()["q_stratified_ate"](spark, SF).collect()}
    segs = {seg for _, seg, _, _, _ in panel}
    assert set(got) == segs
    n_all = len(panel)
    strat = Fraction(0)
    ipw = Fraction(0)
    for seg in segs:
        rows = [p for p in panel if p[1] == seg]
        nt = sum(1 for p in rows if p[2] == 1)
        nc = len(rows) - nt
        y1 = sum(p[3] + p[4] for p in rows if p[2] == 1)
        y0 = sum(p[3] + p[4] for p in rows if p[2] == 0)
        r = got[seg]
        assert (r["n"], r["n_treat"], r["n_ctrl"]) == (len(rows), nt, nc)
        assert (r["y1_cents"], r["y0_cents"]) == (y1, y0)
        if nt and nc:
            assert r["eff_num"] == y1 * nc - y0 * nt
            assert r["eff_den"] == nt * nc
            assert r["w_eff_num"] == len(rows) * r["eff_num"]
            strat += Fraction(r["w_eff_num"], n_all * r["eff_den"])
            e = Fraction(nt, len(rows))
            for _, _, t, x, y in rows:
                ipw += (
                    Fraction(x + y, 1) * (t / e - (1 - t) / (1 - e)) / n_all
                )
        else:
            assert r["eff_num"] is None and r["eff_den"] is None
    # Horvitz-Thompson IPW with exact stratum propensities IS the
    # stratified estimator — the identity that justifies both
    assert strat == ipw
    # fixture non-vacuity: every stratum has both arms at this SF
    assert all(got[s]["eff_num"] is not None for s in segs)


def test_did_matches_replica(spark):
    panel = _panel()
    rows = entry.queries()["q_did_estimator"](spark, SF).collect()
    assert len(rows) == 4
    cells = {}
    for t in (0, 1):
        for post in (0, 1):
            grp = [p for p in panel if p[2] == t]
            s = sum(p[4] if post else p[3] for p in grp)
            cells[(t, post)] = (len(grp), s)
    nt, nc = cells[(1, 1)][0], cells[(0, 1)][0]
    did = (
        Fraction(cells[(1, 1)][1] - cells[(1, 0)][1], nt)
        - Fraction(cells[(0, 1)][1] - cells[(0, 0)][1], nc)
    )
    for r in rows:
        n, s = cells[(r["trt"], r["post"])]
        assert (r["n_users"], r["sum_cents"]) == (n, s)
        assert Fraction(r["did_num"], r["did_den"]) == did
    # fixture non-vacuity: purchases land in every cell
    assert all(s > 0 for _, s in cells.values())


def test_cuped_variance_identity(spark):
    panel = _panel()
    got = {r["seg"]: r for r in entry.queries()["q_cuped_adjustment"](spark, SF).collect()}
    for seg in {p[1] for p in panel}:
        xs = [(p[3], p[4]) for p in panel if p[1] == seg]
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs)
        sxy = sum(x * y for x, y in xs)
        syy = sum(y * y for _, y in xs)
        r = got[seg]
        assert (r["n"], r["sx"], r["sy"], r["sxx"], r["sxy"], r["syy"]) == (
            n, sx, sy, sxx, sxy, syy,
        )
        tn, td, vn = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        assert (r["theta_num"], r["theta_den"], r["vary_num"]) == (tn, td, vn)
        if td > 0 and vn > 0:
            # exact CUPED identity: n^2 * var(Y - theta*X) ==
            # vary_num - theta_num^2/theta_den  (>= 0, Cauchy-Schwarz)
            theta = Fraction(tn, td)
            adj = [Fraction(y) - theta * x for x, y in xs]
            sa = sum(adj)
            saa = sum(a * a for a in adj)
            assert n * saa - sa * sa == Fraction(vn) - Fraction(tn * tn, td)
            assert Fraction(tn * tn, td * vn) <= 1
    # fixture non-vacuity: at least one segment has real signal
    assert any(v["rho2"] is not None for v in got.values())
