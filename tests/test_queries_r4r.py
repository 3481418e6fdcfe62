"""Independent-oracle replica tests for the suffix-array client batch
(q_repeat_extent / q_tandem_repeats / q_lcp_adjacent): full python
replicas over the raw fixture text, incl. the exact greedy-LCP walk."""

from __future__ import annotations

from collections import Counter

import duckdb

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
WIDTHS = [1, 2, 4, 8, 16]


def _toks():
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(text,'') FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    return {
        d: ([t.lower() for t in s.strip().split()] if s.strip() else [])
        for d, s in docs
    }


def test_repeat_extent_matches_replica(spark):
    toks = _toks()
    # corpus-wide multiset of (truncated) windows per width
    counts = {w: Counter() for w in WIDTHS}
    for ts in toks.values():
        for w in WIDTHS:
            for p in range(len(ts)):
                counts[w][tuple(ts[p : p + w])] += 1
    rows = {r["doc_id"]: r for r in entry.queries()["q_repeat_extent"](spark, SF).collect()}
    assert set(rows) == {d for d, ts in toks.items() if ts}
    for d, ts in toks.items():
        if not ts:
            continue
        r = rows[d]
        assert r["n_pos"] == len(ts)
        exp_dup = {
            w: sum(1 for p in range(len(ts)) if counts[w][tuple(ts[p : p + w])] > 1)
            for w in WIDTHS
        }
        for w in WIDTHS:
            assert r[f"dup_w{w}"] == exp_dup[w]
        # monotone staircase: a duplicated 16-window's prefix is a
        # duplicated 8-window at the same position
        assert (
            r["dup_w1"] >= r["dup_w2"] >= r["dup_w4"] >= r["dup_w8"] >= r["dup_w16"]
        )
        exp_ext = max(
            (w for w in WIDTHS if exp_dup[w] > 0), default=0
        )
        assert r["max_extent"] == exp_ext
    # fixture non-vacuity: both boilerplate-heavy and unique-heavy docs
    assert any(r["dup_w16"] > 0 for r in rows.values())
    assert any(r["dup_w16"] < r["n_pos"] for r in rows.values())


def test_tandem_repeats_match_replica(spark):
    toks = _toks()
    rows = {r["width"]: r for r in entry.queries()["q_tandem_repeats"](spark, SF).collect()}
    assert set(rows) == set(WIDTHS)
    for w in WIDTHS:
        anchors = 0
        docs_with = set()
        windows = 0
        for d, ts in toks.items():
            n = len(ts)
            windows += max(0, n - 2 * w + 1)
            for p in range(n - 2 * w + 1):
                if ts[p : p + w] == ts[p + w : p + 2 * w]:
                    anchors += 1
                    docs_with.add(d)
        r = rows[w]
        assert r["n_windows"] == windows
        assert r["n_anchor"] == anchors
        assert r["n_docs"] == len(docs_with)
    # fixture non-vacuity: 'batch batch batch'-style stutter exists
    assert rows[1]["n_anchor"] > 0
    # and some width has zero anchors or at least far fewer than width 1
    assert rows[16]["n_anchor"] < rows[1]["n_anchor"]


def test_lcp_adjacent_matches_greedy_exact(spark):
    toks = _toks()
    suffixes = [
        (tuple(ts[p : p + 16]), d, p)
        for d, ts in toks.items()
        for p in range(len(ts))
    ]
    suffixes.sort()
    rows = {r["sa_rank"]: r for r in entry.queries()["q_lcp_adjacent"](spark, SF).collect()}
    assert len(rows) == len(suffixes) - 1
    saturated = 0
    for i in range(1, len(suffixes)):
        _, d, p = suffixes[i]
        _, pd, pp = suffixes[i - 1]
        r = rows[i + 1]
        assert (r["doc_id"], r["pos"], r["prev_doc"], r["prev_pos"]) == (d, p, pd, pp)
        a, b = toks[d][p:], toks[pd][pp:]
        true_lcp = 0
        while true_lcp < min(len(a), len(b)) and a[true_lcp] == b[true_lcp]:
            true_lcp += 1
        assert r["lcp"] == min(true_lcp, 31)
        saturated += true_lcp >= 31
    lcps = [r["lcp"] for r in rows.values()]
    # fixture non-vacuity: zero, small and >=16 LCPs all occur
    assert 0 in lcps and any(1 <= v < 16 for v in lcps) and any(v >= 16 for v in lcps)
