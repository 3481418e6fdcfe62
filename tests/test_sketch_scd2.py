"""Tests for Count-Min sketch, SCD2 intervals, and the EWMA window shape."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from cliner_spark.sketch import WIDTH, countmin_estimates, countmin_sketch
from cliner_spark.sources import scd2_intervals


def test_countmin_never_underestimates_and_bounds_overcount(spark):
    rng = random.Random(31)
    # zipf-ish stream over a vocab wider than the sketch width (collisions
    # guaranteed), with a few heavy hitters
    stream = []
    for v in range(WIDTH * 2):
        stream += [f"tok{v}"] * (1 + rng.randint(0, 3))
    stream += ["heavy_a"] * 500 + ["heavy_b"] * 200
    toks = spark.createDataFrame([{"tok": t} for t in stream])
    rows = countmin_estimates(toks, min_exact=1).collect()
    n_total = len(stream)
    assert len(rows) == WIDTH * 2 + 2
    for r in rows:
        assert r["overcount"] >= 0, r  # CM guarantee: est >= exact
        assert r["n_est"] == r["n_exact"] + r["overcount"]
        # depth-4 min over width-256 counters: overcount <= colliding mass
        # <= total stream mass minus own mass
        assert r["n_est"] <= n_total
    heavy = {r["tok"]: r for r in rows if r["tok"].startswith("heavy")}
    assert heavy["heavy_a"]["n_exact"] == 500
    assert heavy["heavy_b"]["n_exact"] == 200


def test_countmin_sketch_merges_across_splits(spark):
    stream = [f"t{i % 10}" for i in range(300)]
    toks = spark.createDataFrame([{"tok": t} for t in stream])
    half_a = spark.createDataFrame([{"tok": t} for t in stream[:150]])
    half_b = spark.createDataFrame([{"tok": t} for t in stream[150:]])
    full = {(r["row"], r["bucket"]): r["cnt"] for r in countmin_sketch(toks).collect()}
    sa = {(r["row"], r["bucket"]): r["cnt"] for r in countmin_sketch(half_a).collect()}
    sb = {(r["row"], r["bucket"]): r["cnt"] for r in countmin_sketch(half_b).collect()}
    merged: dict = {}
    for d in (sa, sb):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full  # sketches sum — the mergeability contract


def _gaz(spark, rows):
    return spark.createDataFrame(
        [{"term": t, "cui": c, "score": s} for t, c, s in rows]
    )


def test_scd2_intervals_branches(spark):
    old = _gaz(spark, [("a", "C1", 0.5), ("b", "C2", 0.7), ("c", "C3", 0.9)])
    new = _gaz(spark, [("a", "C1", 0.5), ("b", "C2", 0.8), ("d", "C4", 0.6)])
    got = sorted(
        (r["term"], r["score"], r["valid_from"], r["valid_to"])
        for r in scd2_intervals(old, new).collect()
    )
    assert got == [
        ("a", 0.5, 1, None),        # unchanged: one open row
        ("b", 0.7, 1, 1),           # changed: closed v1 row...
        ("b", 0.8, 2, None),        # ...plus open v2 row
        ("c", 0.9, 1, 1),           # removed: closed row only
        ("d", 0.6, 2, None),        # added: open v2 row
    ]


def test_scd2_row_count_identity(spark):
    # every key contributes 1 row, +1 extra per changed key
    rng = random.Random(41)
    keys = [(f"t{i}", f"C{i}") for i in range(50)]
    old = _gaz(spark, [(t, c, round(rng.uniform(0, 1), 2)) for t, c in keys[:40]])
    new_rows = []
    n_changed = 0
    old_scores = {r["term"]: r["score"] for r in old.collect()}
    for t, c in keys[10:]:
        if t in old_scores and rng.random() < 0.5:
            new_rows.append((t, c, round(old_scores[t] + 0.1, 2)))
            n_changed += 1
        elif t in old_scores:
            new_rows.append((t, c, old_scores[t]))
        else:
            new_rows.append((t, c, 0.5))
    new = _gaz(spark, new_rows)
    n_keys = len({(t, c) for t, c in keys[:40]} | {(t, c, )[0:2] for t, c, _ in new_rows})
    got = scd2_intervals(old, new).count()
    assert got == n_keys + n_changed


def test_kmeans_fixed_point_properties(spark):
    """Assignment rows: one per vector, cluster in [0,k), dist equals the
    exact integer distance to the NEAREST final-1 centroid recomputed in
    python (the argmin property, replicated straight-line)."""
    import hashlib

    from cliner_spark.similarity import kmeans_fixed_point

    rng = random.Random(9)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    emb = spark.createDataFrame(
        [{"vec_id": i, "embedding": v} for i, v in vecs.items()]
    )
    k, rounds = 3, 2
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_fixed_point(emb, k=k, rounds=rounds).collect()}
    assert set(got) == set(vecs)
    assert {c for c, _ in got.values()} <= set(range(k))

    # python replica
    pts = {i: [math.floor((x + 1) * 1000) for x in v] for i, v in vecs.items()}
    seeds = sorted(pts, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cent = {c: list(pts[s]) for c, s in enumerate(seeds)}
    for _ in range(rounds):
        assign = {}
        for i, p in pts.items():
            best = min(
                ((sum((a - b) ** 2 for a, b in zip(p, cent[c])), c) for c in cent)
            )
            assign[i] = best
        newc = {}
        for c in cent:
            members = [pts[i] for i, (_, cc) in assign.items() if cc == c]
            if members:
                newc[c] = [sum(col) // len(members) for col in zip(*members)]
            else:
                newc[c] = cent[c]
        cent = newc
    exp = {i: (c, d) for i, (d, c) in assign.items()}
    assert got == exp
