"""i2b2 .con annotation format: parse (S2) and emit (S4/F11).

Reference analog: code/documents.py .con regex parse ~L230-300 and write
~L300-360 (approx/unverified — SURVEY.md §0). Grammar (i2b2/VA 2010):

    c="<concept text>" L1:S L2:E||t="<type>"

lines are 1-indexed, token offsets 0-indexed end-INCLUSIVE, and concepts
never cross lines (L1 == L2 in valid 2010 data; we validate). The transcript
mapping is line <-> turn: L = turn_idx + 1.

Both directions are built-in expressions (regexp_extract / format_string) —
zero UDFs, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# c="..." 1:2 1:4||t="problem"   (concept text may contain any char but '"')
CON_RE = r'^c="([^"]*)" (\d+):(\d+) (\d+):(\d+)\|\|t="([^"]*)"$'


def format_con_lines(mentions: DataFrame) -> DataFrame:
    """mentions(conv_id, turn_idx, tok_start, tok_end, mention_text,
    concept_type) -> (conv_id, con_line), reference emit order (O1)."""
    return mentions.select(
        "conv_id",
        "turn_idx",
        "tok_start",
        F.format_string(
            'c="%s" %d:%d %d:%d||t="%s"',
            F.lower("mention_text"),
            F.col("turn_idx") + 1,
            F.col("tok_start"),
            F.col("turn_idx") + 1,
            F.col("tok_end"),
            F.col("concept_type"),
        ).alias("con_line"),
    )


def parse_con_lines(con: DataFrame, line_col: str = "con_line") -> DataFrame:
    """(conv_id, con_line) -> mention rows; malformed or line-crossing
    records are dropped (reference behavior: skip unparseable lines)."""
    c = F.col(line_col)
    ext = lambda i: F.regexp_extract(c, CON_RE, i)  # noqa: E731
    parsed = con.select(
        "conv_id",
        ext(1).alias("mention_text"),
        ext(2).alias("_l1"),
        ext(3).alias("_s"),
        ext(4).alias("_l2"),
        ext(5).alias("_e"),
        ext(6).alias("concept_type"),
    ).filter(F.col("_l1") != "")
    return (
        parsed.filter(F.col("_l1") == F.col("_l2"))  # no cross-line concepts
        .select(
            "conv_id",
            (F.col("_l1").cast("int") - 1).alias("turn_idx"),
            F.col("_s").cast("int").alias("tok_start"),
            F.col("_e").cast("int").alias("tok_end"),
            "mention_text",
            "concept_type",
        )
    )
