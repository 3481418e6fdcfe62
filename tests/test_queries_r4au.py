"""Independent-oracle replica tests for the training/experimentation/
storage-cost batch (q_clip_bias / q_ab_interaction / q_lsm_cost_model):
monotone clip identities, the Fractions interaction contrast with the
planted synergy, and direct-exponentiation level counts."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_clip_bias_matches_replica(spark):
    xs = [
        int(math.floor(abs(v) * 1000))
        for (v,) in duckdb.sql(
            f"SELECT value FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    got = {r["clip"]: r for r in entry.queries()["q_clip_bias"](spark, SF).collect()}
    assert set(got) == {1000, 4000, 16000}
    prev_bias = None
    prev_frac = None
    for c in (1000, 4000, 16000):
        clipped = [min(x, c) for x in xs]
        r = got[c]
        assert r["n"] == len(xs)
        assert r["n_clipped"] == sum(1 for x in xs if x > c)
        assert (r["sum_raw"], r["sum_clipped"]) == (sum(xs), sum(clipped))
        assert r["bias_num"] == sum(clipped) - sum(xs)
        assert r["bias_num"] <= 0
        assert math.isclose(
            r["mean_bias"], round((sum(clipped) - sum(xs)) / len(xs), 6),
            abs_tol=1e-6,
        )
        # monotone: larger C clips less and biases less (toward zero)
        if prev_bias is not None:
            assert r["bias_num"] >= prev_bias
            assert r["clip_frac"] <= prev_frac
        prev_bias, prev_frac = r["bias_num"], r["clip_frac"]


def test_ab_interaction_matches_replica(spark):
    ids = [
        i for (i,) in duckdb.sql(
            f"SELECT event_id FROM read_parquet('{SF}/events.parquet')"
        ).fetchall()
    ]
    cells = {}
    for i in ids:
        a = 1 if _md5(f"fa:{i}")[0] < "8" else 0
        b = 1 if _md5(f"fb:{i}")[0] < "8" else 0
        coin = int(_md5(f"fo:{i}")[:2], 16)
        thr = 16 * (8 + 2 * a + 2 * b + 3 * a * b)
        n, s = cells.get((a, b), (0, 0))
        cells[(a, b)] = (n + 1, s + (1 if coin < thr else 0))
    got = {(r["a"], r["b"]): r for r in entry.queries()["q_ab_interaction"](spark, SF).collect()}
    assert set(got) == set(cells)
    n00, s00 = cells[(0, 0)]
    n10, s10 = cells[(1, 0)]
    n01, s01 = cells[(0, 1)]
    n11, s11 = cells[(1, 1)]
    inter = (Fraction(s11, n11) - Fraction(s10, n10)) - (
        Fraction(s01, n01) - Fraction(s00, n00)
    )
    for (a, b), (n, s) in cells.items():
        r = got[(a, b)]
        assert (r["n"], r["s"]) == (n, s)
        assert Fraction(r["interaction_num"], r["interaction_den"]) == inter
        assert math.isclose(r["interaction"], float(inter), abs_tol=2e-6)
        assert math.isclose(r["rate"], round(s / n, 6), abs_tol=1e-9)
    # the planted synergy: +3/16 super-additivity must show through (wide
    # band: the contrast's sampling sd at 1000 events is ~0.06)
    assert 0.05 < float(inter) < 0.35


def test_lsm_cost_model_matches_replica(spark):
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    total = n * 100
    got = {r["fanout"]: r for r in entry.queries()["q_lsm_cost_model"](spark, SF).collect()}
    assert set(got) == {4, 8, 16}
    prev_levels = None
    for f in (4, 8, 16):
        levels = next(
            l for l in range(1, 13) if 1048576 * f**l >= total
        )
        r = got[f]
        assert (r["total_bytes"], r["levels"]) == (total, levels)
        assert r["wa_leveled"] == levels * f
        assert r["wa_tiered"] == levels
        assert r["ra_leveled"] == levels
        assert r["ra_tiered"] == levels * f
        # the duality: leveled pays in writes exactly what tiered pays in
        # reads
        assert r["wa_leveled"] == r["ra_tiered"]
        if prev_levels is not None:
            assert levels <= prev_levels  # bigger fanout, fewer levels
        prev_levels = levels
