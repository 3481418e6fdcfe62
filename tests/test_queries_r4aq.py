"""Independent-oracle replica tests for the two-sample/CI/sampling batch
(q_energy_distance / q_median_ci / q_priority_sampling): a brute-force
pairwise energy computation, the binomial-rank CI replay with coverage
shape, and a full DLT priority-sampling simulation with the estimator's
near-unbiasedness check."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_energy_distance_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT n_chars, lang = 'en' FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    a = sorted(x for x, en in rows if en)
    b = sorted(x for x, en in rows if not en)
    n1, n2 = len(a), len(b)
    # brute-force pairwise sums (the thing the gap identity replaces)
    a_xy = sum(abs(x - y) for x in a for y in b)
    b_xx = sum(abs(x - y) for i, x in enumerate(a) for y in a[i + 1 :])
    c_yy = sum(abs(x - y) for i, x in enumerate(b) for y in b[i + 1 :])
    r = entry.queries()["q_energy_distance"](spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert (r["a_xy"], r["b_xx"], r["c_yy"]) == (a_xy, b_xx, c_yy)
    e = 2 * a_xy / (n1 * n2) - 2 * b_xx / (n1 * n1) - 2 * c_yy / (n2 * n2)
    assert math.isclose(r["energy_distance"], round(e, 6), abs_tol=1e-6)
    # energy distance is nonnegative, zero only for identical distributions
    assert r["energy_distance"] >= 0


def test_median_ci_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    groups = defaultdict(list)
    for s, x in rows:
        groups[s].append(x)
    got = {r["source"]: r for r in entry.queries()["q_median_ci"](spark, SF).collect()}
    assert set(got) == set(groups)
    z = 1.959964
    for s, xs in groups.items():
        xs.sort()
        n = len(xs)
        lo = max(1, int(math.floor((n - z * math.sqrt(n)) / 2)))
        hi = min(n, int(math.ceil(1 + (n + z * math.sqrt(n)) / 2)))
        med = (n + 1) // 2
        r = got[s]
        assert r["n"] == n
        assert (r["ci_lo"], r["median"], r["ci_hi"]) == (
            xs[lo - 1], xs[med - 1], xs[hi - 1],
        )
        # the interval brackets the median and is ordered
        assert r["ci_lo"] <= r["median"] <= r["ci_hi"]


def test_priority_sampling_matches_replica(spark):
    rows = duckdb.sql(
        f"SELECT user_id, event_type, count(*) "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    TWO48 = 281474976710656
    items = []
    for k, et, wt in rows:
        h = int(_md5(f"ps:{k}:{et}")[:12], 16)
        items.append((wt * TWO48 / h, wt, h, k, et))
    items.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    sample = items[:64]
    tau_w, tau_h = items[64][1], items[64][2]
    truth = defaultdict(int)
    for _k, et, wt in [(r[0], r[1], r[2]) for r in rows]:
        truth[et] += wt
    est = defaultdict(lambda: dict(ns=0, big=0, small=0))
    for _p, wt, h, k, et in sample:
        e = est[et]
        e["ns"] += 1
        if wt * tau_h >= tau_w * TWO48:
            e["big"] += wt
        else:
            e["small"] += 1
    got = {r["event_type"]: r for r in entry.queries()["q_priority_sampling"](spark, SF).collect()}
    assert set(got) == set(truth)
    total_est = 0.0
    for et, tmass in truth.items():
        r = got[et]
        e = est.get(et, dict(ns=0, big=0, small=0))
        assert r["true_mass"] == tmass
        assert (r["n_sampled"], r["big_mass"], r["n_small"]) == (
            e["ns"], e["big"], e["small"],
        )
        assert (r["tau_w"], r["tau_h"]) == (tau_w, tau_h)
        em = e["big"] + e["small"] * tau_w * TWO48 / tau_h
        assert math.isclose(r["est_mass"], round(em, 4), abs_tol=1e-3)
        total_est += em
    # DLT is unbiased; with k=64 over this vector the TOTAL estimate
    # should land within 35% of the true total
    total_true = sum(truth.values())
    assert 0.65 < total_est / total_true < 1.35
