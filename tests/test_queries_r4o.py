"""Independent-oracle replica tests for the forecast-quality / local-DP /
campaign-eval batch (q_brier_decomposition / q_randomized_response /
q_gains_chart), incl. the exact-rational Murphy identity."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_brier_murphy_identity_exact(spark):
    rows = entry.queries()["q_brier_decomposition"](spark, SF).collect()
    n_all = sum(r["n"] for r in rows)
    p_all = sum(r["n_pos"] for r in rows)
    # generalized Murphy for binned continuous forecasts (Stephenson 2008):
    # Brier = REL - RES + UNC + WBV - 2*WBC, all in exact rational arithmetic
    brier = sum(Fraction(r["brier_num"], 1000000 * n_all) for r in rows)
    rel = sum(Fraction(r["rel_num"], r["rel_den"] * n_all) for r in rows)
    res = sum(Fraction(r["res_num"], r["res_den"] * n_all) for r in rows)
    wbv = sum(Fraction(r["wbv_num"], r["rel_den"] * n_all) for r in rows)
    wbc = sum(Fraction(r["wbc_num"], r["rel_den"] * n_all) for r in rows)
    unc = Fraction(p_all * (n_all - p_all), n_all * n_all)
    assert brier == rel - res + unc + wbv - 2 * wbc
    # within-bin variance is nonnegative by Cauchy-Schwarz; the fixture's
    # binning actually hides spread somewhere
    assert all(r["wbv_num"] >= 0 for r in rows)
    assert any(r["wbv_num"] > 0 for r in rows)
    # denominators are what the docstring claims
    for r in rows:
        assert r["rel_den"] == 1000000 * r["n"]
        assert r["res_den"] == r["n"] * n_all * n_all
        assert 0 <= r["n_pos"] <= r["n"]
    # fixture non-vacuity: bins with and without positives both occur
    assert any(r["n_pos"] > 0 for r in rows)
    assert any(r["n_pos"] < r["n"] for r in rows)


def test_randomized_response_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, source, lang "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    led = {}
    for doc_id, source, lang in docs:
        truth = 1 if lang == "en" else 0
        flip = 1 if int(_md5(f"rr1:{doc_id}")[0], 16) % 4 == 0 else 0
        rep = 1 - truth if flip else truth
        row = led.setdefault(source, [0, 0, 0])
        row[0] += 1
        row[1] += truth
        row[2] += rep
    rows = entry.queries()["q_randomized_response"](spark, SF).collect()
    assert len(rows) == len(led)
    flipped_somewhere = False
    for r in rows:
        n, tp, rep = led[r["source"]]
        assert (r["n"], r["true_pos"], r["n_reported"]) == (n, tp, rep)
        assert r["est_num"] == 4 * rep - n and r["est_den"] == 2
        assert r["abs_err_num"] == abs(2 * tp - (4 * rep - n))
        flipped_somewhere |= rep != tp
    # fixture non-vacuity: the md5 coin actually flipped some answers
    assert flipped_somewhere


def test_gains_chart_matches_replica(spark):
    ev = duckdb.sql(
        f"SELECT user_id, event_type "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    u = {}
    for uid, et in ev:
        row = u.setdefault(uid, [0, 0])
        row[0] += et == "click"
        row[1] += et == "purchase"
    n_u = len(u)
    out_all = sum(v[1] for v in u.values())
    order = sorted(u, key=lambda k: (-u[k][0], k))
    dec = {}
    for i, uid in enumerate(order):
        d = (i * 10) // n_u
        row = dec.setdefault(d, [0, 0, 0])
        row[0] += 1
        row[1] += u[uid][1]
        row[2] += u[uid][0]
    rows = sorted(
        entry.queries()["q_gains_chart"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    cum_u = cum_o = 0
    for r in rows:
        d = r["decile"]
        assert (r["n_users"], r["outcomes"], r["score_sum"]) == tuple(dec[d])
        cum_u += dec[d][0]
        cum_o += dec[d][1]
        assert (r["cum_users"], r["cum_outcomes"]) == (cum_u, cum_o)
        assert r["lift_num"] == cum_o * n_u - cum_u * out_all
        assert r["lift_den"] == cum_u * out_all
    # the gains curve is monotone and ends at full capture (lift -> 1)
    assert rows[-1]["cum_outcomes"] == out_all
    assert rows[-1]["cum_users"] == n_u
    assert rows[-1]["lift_num"] == 0
    # fixture non-vacuity: the curve is not the random diagonal everywhere
    assert any(r["lift_num"] != 0 for r in rows[:-1])
