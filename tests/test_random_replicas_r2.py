"""Seeded randomized replica tests for round-2 operators: each test builds
a random input, computes the expected result with an independent pure-Python
oracle, and compares the Spark output exactly (one Spark action per seed —
the repo's established style for property coverage without per-example job
overhead)."""

from __future__ import annotations

import datetime as dt
import random
from collections import Counter, defaultdict

from cliner_spark.dedup import crossdoc_ngram_dup
from cliner_spark.timeseries import banded_interval_join, funnel_conversion

BASE = dt.datetime(2024, 1, 1)


def test_band_join_matches_naive_theta_join(spark):
    """The bucketed two-equi-join decomposition must equal the naive
    O(n^2) theta join on random event streams — catches bucket-boundary
    off-by-ones that hand-picked cases miss."""
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        rows = []
        for i in range(300):
            rows.append(
                {
                    "event_id": i,
                    "user_id": rng.randrange(6),
                    "event_type": rng.choice(["click", "error", "view"]),
                    "ts": BASE + dt.timedelta(seconds=rng.randrange(0, 7200)),
                }
            )
        band = 600
        expect = set()
        for r in rows:
            if r["event_type"] != "error":
                continue
            for l in rows:
                if (
                    l["event_type"] == "click"
                    and l["user_id"] == r["user_id"]
                    and l["ts"] <= r["ts"]
                    and l["ts"] >= r["ts"] - dt.timedelta(seconds=band)
                ):
                    expect.add((l["event_id"], r["event_id"]))
        got = {
            (x["left_id"], x["right_id"])
            for x in banded_interval_join(
                spark.createDataFrame(rows), "click", "error", band_minutes=10
            ).collect()
        }
        assert got == expect, f"seed {seed}: {got ^ expect}"


def test_funnel_matches_sequential_scan(spark):
    """Chained conditional min-aggregates must equal a per-user sequential
    first-touch scan."""
    steps = ("view", "click", "purchase")
    for seed in (3, 11):
        rng = random.Random(seed)
        rows = []
        for i in range(400):
            rows.append(
                {
                    "event_id": i,
                    "user_id": rng.randrange(25),
                    "event_type": rng.choice(
                        ["view", "click", "purchase", "error"]
                    ),
                    # coarse grid on purpose: generates ts ties, which the
                    # strictly-after rule must handle identically
                    "ts": BASE + dt.timedelta(seconds=60 * rng.randrange(0, 50)),
                }
            )
        by_user = defaultdict(list)
        for r in rows:
            by_user[r["user_id"]].append((r["ts"], r["event_type"]))
        expect = {}
        for u, evs in by_user.items():
            prev_t, depth = None, 0
            for k, s in enumerate(steps):
                cand = [
                    t
                    for (t, typ) in evs
                    if typ == s and (prev_t is None or t > prev_t)
                ]
                if not cand:
                    break
                prev_t = min(cand)
                depth = k + 1
            expect[u] = depth
        got = {
            r["user_id"]: r["depth"]
            for r in funnel_conversion(spark.createDataFrame(rows), steps).collect()
        }
        assert got == expect, f"seed {seed}"


def test_crossdoc_ngram_dup_matches_python(spark):
    for seed in (5,):
        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc", "dd"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
            for _ in range(60)
        ]
        n = 3
        grams_by_doc = []
        for t in texts:
            toks = [w.lower() for w in t.split()]
            grams_by_doc.append(
                [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            )
        docs_per_gram = defaultdict(set)
        for i, gs in enumerate(grams_by_doc):
            for g in gs:
                docs_per_gram[g].add(i)
        expect = {}
        for i, gs in enumerate(grams_by_doc):
            dup = sum(1 for g in gs if len(docs_per_gram[g]) >= 2)
            expect[i] = (len(gs), dup)
        df = spark.createDataFrame(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        got = {
            r["doc_id"]: (r["n_pos"], r["n_dup_pos"])
            for r in crossdoc_ngram_dup(df, n=n).collect()
        }
        assert got == expect
