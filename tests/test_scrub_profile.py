"""Unit tests for scrub.py (PII redaction chain) and profiling.py."""

from __future__ import annotations

from cliner_spark.profiling import histogram, profile_table
from cliner_spark.scrub import scrub


def test_scrub_default_rules_planted_pii(spark):
    df = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "mail me at jane.doe+x@example.org today"},
            {"doc_id": 1, "text": "see https://example.com/a?b=c#frag now"},
            {"doc_id": 2, "text": "call 555-123-4567 or id 1234567890"},
            {"doc_id": 3, "text": "clean text stays clean"},
            {"doc_id": 4, "text": None},
        ]
    )
    got = {r["doc_id"]: (r["scrubbed"], r["n_redactions"]) for r in scrub(df).collect()}
    assert got[0] == ("mail me at <EMAIL> today", 1)
    assert got[1] == ("see <URL> now", 1)
    assert got[2] == ("call <PHONE> or id <ID>", 2)
    assert got[3] == ("clean text stays clean", 0)
    assert got[4] == ("", 0)


def test_scrub_url_with_embedded_email_counts_once(spark):
    # URL rule runs first and swallows the whole token; the email rule must
    # not double-count inside the placeholder
    df = spark.createDataFrame([{"doc_id": 0, "text": "x https://u@host.com/p y"}])
    r = scrub(df).collect()[0]
    assert r["scrubbed"] == "x <URL> y" and r["n_redactions"] == 1


def test_profile_table_exact(spark):
    df = spark.createDataFrame(
        [
            {"a": 1, "b": "x"},
            {"a": 2, "b": "y"},
            {"a": None, "b": "x"},
        ]
    )
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert got["a"]["n_rows"] == 3 and got["a"]["n_nulls"] == 1
    assert got["a"]["n_distinct"] == 2
    assert (got["a"]["min_val"], got["a"]["max_val"]) == ("1", "2")
    assert got["b"]["n_distinct"] == 2 and got["b"]["n_nulls"] == 0
    assert (got["b"]["min_val"], got["b"]["max_val"]) == ("x", "y")


def test_histogram_buckets(spark):
    df = spark.createDataFrame([{"v": x} for x in [0.0, 4.9, 5.0, 12.0, None]])
    got = {r["bucket"]: (r["lo"], r["n"]) for r in histogram(df, "v", 5.0).collect()}
    assert got == {0: (0.0, 2), 1: (5.0, 1), 2: (10.0, 1)}
