"""Tokenization (SURVEY.md P1–P3; reference: code/documents.py ~L90–120,
whitespace split, approx/unverified — SURVEY.md §0).

Default path is pure built-in expressions (whole-stage codegen, zero Python):
tokens = split(trim(text), '\\s+').  A pandas-UDF variant adds character
offsets for the i2b2 .con formatter round-trip.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tokens_col(text_col: str | Column = "text") -> Column:
    """Whitespace tokens; empty/blank text -> empty array (not [''])."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    trimmed = F.trim(F.coalesce(c, F.lit("")))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    return df.withColumn(out_col, tokens_col(text_col))


def drop_blank_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P3 — reference skips blank lines (documents.py ~L70–80)."""
    return df.filter(F.length(F.trim(F.col(text_col))) > 0)


_TOK_OFFSET_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("starts", T.ArrayType(T.IntegerType()), False),
    ]
)


@F.pandas_udf(_TOK_OFFSET_SCHEMA)
def tokenize_with_offsets(text: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized tokenizer returning char start offsets alongside
    tokens (needed only by the .con formatter; the hot path uses tokens_col).
    """
    toks_out, starts_out = [], []
    for s in text.fillna(""):
        toks, starts, i, n = [], [], 0, len(s)
        while i < n:
            while i < n and s[i].isspace():
                i += 1
            if i >= n:
                break
            j = i
            while j < n and not s[j].isspace():
                j += 1
            toks.append(s[i:j])
            starts.append(i)
            i = j
        toks_out.append(toks)
        starts_out.append(starts)
    return pd.DataFrame({"tokens": toks_out, "starts": starts_out})
