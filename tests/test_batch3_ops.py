"""Unit tests for round-2 batch 3: sliding windows, funnel, Adamic-Adar."""

from __future__ import annotations

import datetime as dt
import math

from cliner_spark.graph import adamic_adar
from cliner_spark.timeseries import funnel_conversion, sliding_window_counts


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    return spark.createDataFrame(
        [
            {
                "event_id": i,
                "user_id": u,
                "event_type": t,
                "ts": base + dt.timedelta(seconds=s),
            }
            for i, (u, t, s) in enumerate(rows)
        ]
    )


def test_sliding_window_event_in_three_windows(spark):
    ev = _events(spark, [(1, "view", 60 * 25)])  # 00:25
    got = sorted(
        (r["win_start"].minute, r["n"])
        for r in sliding_window_counts(ev, 30, 10).collect()
    )
    # windows [00:00,00:30) [00:10,00:40) [00:20,00:50) all contain 00:25
    assert got == [(0, 1), (10, 1), (20, 1)]


def test_funnel_depth_order_matters(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
            # user 2: purchase BEFORE click -> depth 2
            (2, "view", 0), (2, "purchase", 5), (2, "click", 10),
            # user 3: click only (no view first) -> depth 0
            (3, "click", 0),
            # user 4: unrelated events -> depth 0
            (4, "error", 0),
            # user 5: view twice, click between -> depth 2 (first-touch view)
            (5, "view", 0), (5, "click", 5), (5, "view", 10),
        ],
    )
    got = {r["user_id"]: r["depth"] for r in funnel_conversion(ev).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 0, 5: 2}


def test_funnel_strictly_after(spark):
    # click at the SAME timestamp as first view does not count
    ev = _events(spark, [(1, "view", 0), (1, "click", 0)])
    got = {r["user_id"]: r["depth"] for r in funnel_conversion(ev).collect()}
    assert got == {1: 1}


def test_adamic_adar_path_graph(spark):
    # path a-b-c: only common-neighbor pair is (a, c) via b, deg(b)=2
    edges = spark.createDataFrame(
        [{"src": "a", "dst": "b"}, {"src": "b", "dst": "c"}]
    )
    got = adamic_adar(edges).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["src"], r["dst"], r["n_common"]) == ("a", "c", 1)
    assert r["score_fp"] == math.floor(1e6 / math.log(2))


def test_adamic_adar_star_hub_contributes_little(spark):
    # star: hub h connected to x1..x4 -> all pairs share h, deg(h)=4
    edges = spark.createDataFrame(
        [{"src": "h", "dst": f"x{i}"} for i in range(1, 5)]
    )
    got = adamic_adar(edges).collect()
    assert len(got) == 6  # C(4,2) pairs
    assert all(r["score_fp"] == math.floor(1e6 / math.log(4)) for r in got)
