"""Explicit StructTypes for every table in the pipeline (SURVEY.md §1, D1–D10).

No schema inference anywhere in the pipeline proper; the transcript schema is
fixed by BASELINE.json:input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# D1/D2 — primary input (BASELINE.json:input_hint), one row per turn.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# D7 — broadcast gazetteer (reference: UMLS SQLite, umls_dir/create_sqliteDB.py).
GAZETTEER = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("cui", T.StringType(), False),
        T.StructField("sem_type", T.StringType(), False),
        T.StructField("canonical", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# D5 — mention span (i2b2 .con record recast; reference code/documents.py).
MENTIONS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tok_start", T.IntegerType(), False),
        T.StructField("tok_end", T.IntegerType(), False),  # inclusive (i2b2)
        T.StructField("mention_text", T.StringType(), False),
        T.StructField("concept_type", T.StringType(), False),
    ]
)

# Linked mention = mention + entity-link result (J2/J5).
LINKED_MENTIONS = T.StructType(
    MENTIONS.fields
    + [
        T.StructField("cui", T.StringType(), False),
        T.StructField("canonical", T.StringType(), False),
        T.StructField("link_score", T.DoubleType(), False),
    ]
)

# D10 — output triples (north rule).
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
    ]
)

PREDICATES = ("MENTIONS", "ASSERTED_IN", "SAME_AS", "LINKED_TO")

# 7-way IOB tagset (reference: documents.py conlist, D4).
CONCEPT_TYPES = ("problem", "test", "treatment")
TAGS = ("O",) + tuple(f"{b}-{t}" for t in CONCEPT_TYPES for b in ("B", "I"))
TAG_TO_ID = {t: i for i, t in enumerate(TAGS)}

# A5 — per-partition progress/lineage (north rule: resumability).
PROGRESS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("lineage", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
