"""Unit tests for round-2 retrieval/duplication operators: tf-idf top
terms, BM25 ranking, cross-document n-gram duplication rate."""

from __future__ import annotations

import math

from cliner_spark.dedup import crossdoc_ngram_dup
from cliner_spark.textstats import bm25_rank, tfidf_top_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )


def test_tfidf_hand_computed(spark):
    df = _docs(spark, ["cat dog", "cat cat fish", "bird"])
    rows = {(r["doc_id"], r["term"]): r for r in tfidf_top_terms(df, k=3).collect()}
    # N=3. df: cat=2, dog=1, fish=1, bird=1
    assert rows[(0, "dog")]["score"] == round(1 * math.log(4 / 2), 6)
    assert rows[(1, "cat")]["score"] == round(2 * math.log(4 / 3), 6)
    # tie-break: doc0 has cat(score ln(4/3)~0.287) < dog(ln2~0.693) -> dog rk1
    assert rows[(0, "dog")]["rk"] == 1 and rows[(0, "cat")]["rk"] == 2
    # k cap respected
    assert max(r["rk"] for r in rows.values()) <= 3


def test_bm25_prefers_matching_short_doc(spark):
    df = _docs(
        spark,
        [
            "stream stream filler filler filler filler",  # 2 hits, long
            "stream stream",  # 2 hits, short -> higher norm score
            "other words only",
        ],
    )
    got = bm25_rank(df, ["stream"], k=10).collect()
    ids = [r["doc_id"] for r in sorted(got, key=lambda r: r["rk"])]
    assert ids == [1, 0]  # non-matching doc absent; short doc wins
    assert all(r["score"] > 0 for r in got)


def test_bm25_empty_query_hits(spark):
    df = _docs(spark, ["a b", "c d"])
    assert bm25_rank(df, ["zzz"], k=5).count() == 0


def test_crossdoc_ngram_dup_rate(spark):
    df = _docs(
        spark,
        [
            "a b c d",      # grams: abc, bcd
            "x a b c",      # grams: xab, abc -> shares abc with doc0
            "q r",          # no 3-grams
        ],
    )
    got = {r["doc_id"]: r for r in crossdoc_ngram_dup(df, n=3).collect()}
    assert (got[0]["n_pos"], got[0]["n_dup_pos"]) == (2, 1)
    assert got[0]["dup_rate"] == 0.5
    assert (got[1]["n_pos"], got[1]["n_dup_pos"]) == (2, 1)
    assert (got[2]["n_pos"], got[2]["n_dup_pos"]) == (0, 0)
    assert got[2]["dup_rate"] == 0.0
    # intra-doc repetition alone is NOT cross-doc duplication
    solo = _docs(spark, ["m n o m n o", "unrelated text here"])
    g2 = {r["doc_id"]: r for r in crossdoc_ngram_dup(solo, n=3).collect()}
    assert g2[0]["n_dup_pos"] == 0
