"""Python UDTF surface (cliner_spark.tablefuncs): sentence splitting with
max-token re-chunking (LATERAL) and gaps-and-islands sessionization
(TABLE argument with PARTITION BY/ORDER BY), cross-checked against plain
Python and against the window-function formulation on random input.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from cliner_spark.tablefuncs import (
    MAX_SENT_TOKENS,
    SESSION_GAP_SEC,
    sessionize,
    split_sentences,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_sentence_split_punctuation_trim_and_blank_drop(spark):
    docs = _mk_docs(
        spark,
        [
            ("a", "one two. three four!  \t five ?? six..."),
            ("b", "...!?"),  # only punctuation -> no rows
            ("c", "   "),  # only whitespace -> no rows
            ("d", "solo"),
        ],
    )
    got = {
        (r.doc_id, r.sent_idx): r.sentence
        for r in split_sentences(docs).collect()
    }
    assert got == {
        ("a", 0): "one two",
        ("a", 1): "three four",
        ("a", 2): "five",
        ("a", 3): "six",
        ("d", 0): "solo",
    }


def test_sentence_split_rechunks_long_pieces(spark):
    n = MAX_SENT_TOKENS * 2 + 3  # 2 full windows + a 3-token tail
    text = " ".join(f"w{i}" for i in range(n))
    rows = split_sentences(_mk_docs(spark, [("x", text)])).collect()
    assert [r.sent_idx for r in sorted(rows, key=lambda r: r.sent_idx)] == [0, 1, 2]
    by_idx = {r.sent_idx: r.sentence.split() for r in rows}
    assert by_idx[0] == [f"w{i}" for i in range(MAX_SENT_TOKENS)]
    assert by_idx[1] == [f"w{i}" for i in range(MAX_SENT_TOKENS, 2 * MAX_SENT_TOKENS)]
    assert by_idx[2] == [f"w{i}" for i in range(2 * MAX_SENT_TOKENS, n)]


def _py_sessions(events):
    """Straight-line oracle: events = [(user_id, ts)] in any order."""
    out = []
    by_user: dict[str, list[dt.datetime]] = {}
    for uid, ts in events:
        by_user.setdefault(uid, []).append(ts)
    for uid, tss in by_user.items():
        tss.sort()
        sid, n, start, last = -1, 0, None, None
        for ts in tss:
            if last is None or (ts - last).total_seconds() > SESSION_GAP_SEC:
                if n:
                    out.append((uid, sid, n, start, last))
                sid, n, start = sid + 1, 1, ts
            else:
                n += 1
            last = ts
        if n:
            out.append((uid, sid, n, start, last))
    return sorted(out)


def test_sessionize_matches_python_oracle_on_random_input(spark):
    rng = random.Random(42)
    base = dt.datetime(2025, 1, 1)
    events = []
    for i in range(400):
        uid = f"u{rng.randrange(7)}"
        # gaps straddle the 1800 s threshold, including exact-boundary values
        ts = base + dt.timedelta(seconds=rng.randrange(0, 86400, 300))
        events.append((uid, ts))
    df = spark.createDataFrame(
        [(u, t) for u, t in events], "user_id string, ts timestamp"
    ).repartition(4)
    got = sorted(
        (r.user_id, r.session_id, r.n_events, r.start_ts, r.end_ts)
        for r in sessionize(df).collect()
    )
    assert got == _py_sessions(events)


def test_sessionize_exact_gap_is_same_session(spark):
    base = dt.datetime(2025, 6, 1)
    df = spark.createDataFrame(
        [
            ("u", base),
            ("u", base + dt.timedelta(seconds=SESSION_GAP_SEC)),  # == gap: same
            ("u", base + dt.timedelta(seconds=2 * SESSION_GAP_SEC + 1)),  # > gap
        ],
        "user_id string, ts timestamp",
    )
    rows = sorted(sessionize(df).collect(), key=lambda r: r.session_id)
    assert [(r.session_id, r.n_events) for r in rows] == [(0, 2), (1, 1)]
