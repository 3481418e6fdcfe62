"""Grouped-map / cogrouped-map pandas operators (cliner_spark.grouped):
median/MAD outlier summary and cogrouped merge_asof alignment, with the
degenerate cases the sf-table oracle run cannot hit (constant-valued user,
user with no right-side events, exact-timestamp match).
"""

from __future__ import annotations

import datetime as dt

from cliner_spark.grouped import asof_align, robust_user_outliers


def test_robust_outliers_flags_spike_and_constant_user(spark):
    rows = [(1, float(v)) for v in [10, 12, 9, 11, 10, 8, 500]]  # one spike
    rows += [(2, 7.0)] * 5  # constant user: MAD == 0 -> no outliers
    df = spark.createDataFrame(rows, "user_id bigint, value double")
    got = {r.user_id: r for r in robust_user_outliers(df).collect()}
    assert got[1].n_events == 7
    assert got[1].med == 10.0
    assert got[1].mad == 1.0  # |v - 10| sorted: 0,0,1,1,2,2,490
    assert got[1].n_outliers == 1  # only the 500 spike (490 > 3*1.4826)
    assert got[2].mad == 0.0 and got[2].n_outliers == 0


def test_asof_align_backward_exact_and_missing(spark):
    t0 = dt.datetime(2025, 3, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            (100, 1, ts(10)),  # after right@5 -> 5.0, gap 5000 ms
            (101, 1, ts(20)),  # exact match right@20 -> 20.0, gap 0
            (102, 1, ts(3)),  # before any right -> null
            (103, 2, ts(50)),  # user 2 has no right events -> null
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts(5), 5.0),
            (1, ts(20), 20.0),
            (1, ts(20), 15.0),  # tie on ts: pre-agg keeps max -> 20.0
        ],
        "user_id bigint, ts timestamp, value double",
    )
    got = {r.event_id: r for r in asof_align(left, right).collect()}
    assert got[100].last_right_value == 5.0 and got[100].gap_ms == 5000
    assert got[101].last_right_value == 20.0 and got[101].gap_ms == 0
    assert got[102].last_right_value is None and got[102].gap_ms is None
    assert got[103].last_right_value is None and got[103].gap_ms is None
