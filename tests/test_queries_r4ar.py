"""Independent-oracle replica tests for the SRE-observability/analytics
batch (q_slo_burn_alert / q_trace_sampling / q_mix_rate_decomposition):
burn-rate window replays, per-trace all-or-nothing verification, and the
Fractions-exact decomposition identity sum(mix + rate) == R_B - R_A."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from datetime import timedelta
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_slo_burn_alert_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT ts, event_id FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    t1 = max(ts for ts, _e in rows)
    rules = {"page": (1, 6, 144), "ticket": (6, 72, 60), "trend": (72, 72, 10)}
    got = {r["rule"]: r for r in entry.queries()["q_slo_burn_alert"](spark, SF).collect()}
    assert set(got) == set(rules)
    for rule, (lh, sh, thr) in rules.items():
        n_l = e_l = n_s = e_s = 0
        for ts, eid in rows:
            err = _md5(f"ok:{eid}")[:2] < "04"
            if ts > t1 - timedelta(hours=lh):
                n_l += 1
                e_l += err
            if ts > t1 - timedelta(hours=sh):
                n_s += 1
                e_s += err
        r = got[rule]
        assert (r["n_long"], r["e_long"], r["n_short"], r["e_short"]) == (
            n_l, e_l, n_s, e_s,
        )
        fired = 1 if (100000 * e_l > thr * n_l and 100000 * e_s > thr * n_s) else 0
        assert r["fired"] == fired
        assert math.isclose(
            r["burn_long"], round(10000.0 * e_l / n_l / 10, 6), abs_tol=1e-6
        )
    # the planted ~1.56x burn: the slow trend rule (1x) must fire, the fast
    # page rule (14.4x) must not
    assert got["trend"]["fired"] == 1
    assert got["page"]["fired"] == 0


def test_trace_sampling_matches_replica(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    convs = defaultdict(list)
    order = defaultdict(list)
    for did, text in sorted(docs):
        order[did % 97].append((did, len(text.split())))
    for conv, lst in order.items():
        for idx, (_did, ntoks) in enumerate(lst):
            err = _md5(f"err:{conv}:{idx}")[0] == "0"
            convs[conv].append((ntoks, err))
    classes = defaultdict(lambda: dict(tr=0, sp=0, kept=0))
    for conv, spans in convs.items():
        has_err = any(e for _n, e in spans)
        has_slow = any(n > 90 for n, _e in spans)
        reason = (
            "both" if has_err and has_slow
            else "error_only" if has_err
            else "slow_only" if has_slow
            else "none"
        )
        c = classes[reason]
        c["tr"] += 1
        c["sp"] += len(spans)
        if has_err or has_slow:
            c["kept"] += len(spans)
    got = {r["reason"]: r for r in entry.queries()["q_trace_sampling"](spark, SF).collect()}
    assert set(got) == set(classes)
    for reason, c in classes.items():
        r = got[reason]
        assert (r["n_traces"], r["n_spans"]) == (c["tr"], c["sp"])
        assert r["spans_kept"] == c["kept"]
        assert r["n_partial"] == 0
        # all-or-nothing: kept mass is the whole class or zero
        assert r["spans_kept"] in (0, r["n_spans"])
        assert r["sampled"] == (0 if reason == "none" else 1)


def test_mix_rate_decomposition_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), event_id "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    d0 = min(d for _t, d, _e in rows)
    d1 = max(d for _t, d, _e in rows)
    mid = d0 + timedelta(days=(d1 - d0).days // 2)
    per = defaultdict(lambda: [0, 0, 0, 0])  # v_a, e_a, v_b, e_b
    for et, d, eid in rows:
        err = _md5(f"e2:{eid}")[0] < "2"
        e = per[et]
        if d <= mid:
            e[0] += 1
            e[1] += err
        else:
            e[2] += 1
            e[3] += err
    va = sum(e[0] for e in per.values())
    vb = sum(e[2] for e in per.values())
    ea = sum(e[1] for e in per.values())
    eb = sum(e[3] for e in per.values())
    got = {r["event_type"]: r for r in entry.queries()["q_mix_rate_decomposition"](spark, SF).collect()}
    expected_types = {t for t, e in per.items() if e[0] > 0 and e[2] > 0}
    assert set(got) == expected_types
    total = Fraction(0)
    for et in expected_types:
        v_a, e_a, v_b, e_b = per[et]
        r = got[et]
        assert (r["v_a"], r["e_a"], r["v_b"], r["e_b"]) == (v_a, e_a, v_b, e_b)
        mix = (Fraction(v_b, vb) - Fraction(v_a, va)) * Fraction(e_a, v_a)
        rate = Fraction(v_b, vb) * (Fraction(e_b, v_b) - Fraction(e_a, v_a))
        assert Fraction(r["mix_num"], r["mix_den"]) == mix
        assert Fraction(r["rate_core"], r["rate_den"]) == rate
        assert math.isclose(r["mix_effect"], float(mix), abs_tol=2e-8)
        assert math.isclose(r["rate_effect"], float(rate), abs_tol=2e-8)
        total += mix + rate
    # the accounting identity (exact, assuming every type is in both halves
    # — true on this fixture, so the excluded-remainder term is zero)
    assert set(per) == expected_types
    assert total == Fraction(eb, vb) - Fraction(ea, va)
