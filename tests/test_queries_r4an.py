"""Independent-oracle replica tests for the experiment/streaming
governance batch (q_abtest_srm / q_multiple_testing /
q_stream_state_audit): a daily SRM replay, the Bonferroni subset Holm
subset BH nesting proof, and a sliding state-store simulation."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_abtest_srm_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT CAST(CAST(ts AS DATE) AS VARCHAR), event_id "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    daily = defaultdict(lambda: [0, 0])
    for day, eid in rows:
        if _md5(f"arm:{eid}")[0] < "8":
            daily[day][0] += 1
        else:
            daily[day][1] += 1
    t_nt = sum(v[0] for v in daily.values())
    t_nc = sum(v[1] for v in daily.values())
    got = {r["day"]: r for r in entry.queries()["q_abtest_srm"](spark, SF).collect()}
    assert set(got) == set(daily)
    overall = 1 if 1000 * (t_nt - t_nc) ** 2 > 3841 * (t_nt + t_nc) else 0
    for day, (nt, nc) in daily.items():
        r = got[day]
        assert (r["nt"], r["nc"], r["diff"]) == (nt, nc, nt - nc)
        assert math.isclose(
            r["chi2"], round((nt - nc) ** 2 / (nt + nc), 6), abs_tol=1e-9
        )
        assert r["srm_flag"] == (1 if 1000 * (nt - nc) ** 2 > 3841 * (nt + nc) else 0)
        assert (r["t_nt"], r["t_nc"], r["overall_flag"]) == (t_nt, t_nc, overall)
    # a healthy md5 coin: the overall ratio cannot be SRM-broken
    assert overall == 0


def test_multiple_testing_nesting(spark):
    got = {r["source"]: r for r in entry.queries()["q_multiple_testing"](spark, SF).collect()}
    bh = {r["source"]: r for r in entry.queries()["q_bh_fdr"](spark, SF).collect()}
    assert set(got) == set(bh)
    m = len(got)
    # p-values and ranks must agree with the shared pipeline
    for s, r in got.items():
        assert (r["p_num"], r["p_den"]) == (bh[s]["p_num"], bh[s]["p_den"])
        assert r["p_rank"] == bh[s]["bh_rank"]
        assert r["m"] == m
        assert r["bh_rejected"] == (1 if bh[s]["rejected"] else 0)
        # definitions, replayed: alpha = 1/10
        assert r["bonf_rejected"] == (1 if 10 * m * r["p_num"] <= r["p_den"] else 0)
    # Holm step-down replay on the sorted p-values
    ranked = sorted(got.values(), key=lambda r: r["p_rank"])
    first_fail = None
    for r in ranked:
        if 10 * (m - r["p_rank"] + 1) * r["p_num"] > r["p_den"]:
            first_fail = r["p_rank"]
            break
    for r in ranked:
        expect = 1 if (first_fail is None or r["p_rank"] < first_fail) else 0
        assert r["holm_rejected"] == expect
    # the textbook nesting: Bonferroni <= Holm <= BH rejections
    nb = sum(r["bonf_rejected"] for r in got.values())
    nh = sum(r["holm_rejected"] for r in got.values())
    nf = sum(r["bh_rejected"] for r in got.values())
    assert nb <= nh <= nf
    for r in got.values():
        assert r["bonf_rejected"] <= r["holm_rejected"] <= r["bh_rejected"]


def test_stream_state_audit_matches_replica(spark):
    mins = [
        m for (m,) in duckdb.sql(
            f"SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) "
            f"FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    from collections import Counter

    cnt = Counter(mins)
    m0, m1 = min(cnt), max(cnt)
    xs = [cnt.get(m, 0) for m in range(m0, m1 + 1)]
    got = {r["delay_min"]: r for r in entry.queries()["q_stream_state_audit"](spark, SF).collect()}
    assert set(got) == {60, 360, 1440}
    for d in (60, 360, 1440):
        # sliding window sum over the zero-filled grid
        states = []
        run = 0
        for i, x in enumerate(xs):
            run += x
            if i - d >= 0:
                run -= xs[i - d]
            states.append(run)
        peak = max(states)
        r = got[d]
        assert r["n_minutes"] == len(xs)
        assert r["peak_state"] == peak
        assert r["peak_minute"] == m0 + states.index(peak)
        assert r["state_row_minutes"] == sum(states)
        assert math.isclose(
            r["avg_state"], round(sum(states) / len(xs), 6), abs_tol=1e-9
        )
    # longer delay holds no less state, everywhere
    assert (
        got[60]["state_row_minutes"]
        <= got[360]["state_row_minutes"]
        <= got[1440]["state_row_minutes"]
    )
    assert got[60]["peak_state"] <= got[1440]["peak_state"]
