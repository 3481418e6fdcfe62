"""Gazetteer mention scanning (SURVEY.md J2/O2; reference:
code/feature_extraction/umls_features.py + interpret_umls.py longest-match
phrase lookup, approx/unverified — SURVEY.md §0).

Semantics (defined once, implemented three ways — Spark expressions, Arrow
UDF, DuckDB oracle SQL, plus the plain-Python test oracle):

  1. Candidates: every n-gram (1 <= n <= MAX_TERM_TOKENS) of the turn's
     whitespace tokens whose lowercase join matches a gazetteer term.
  2. Dominance filter ("leftmost-longest", set-based): candidate A is dropped
     iff some candidate B overlaps it and B is better — longer, or same
     length with a smaller start. The kept set is provably overlap-free and
     the rule is non-sequential, so it parallelizes (unlike a greedy scan).

Scale notes:
- `scan_mentions_expr` is 100% JVM expressions over per-turn arrays: zero
  shuffle, whole-stage codegen, gazetteer embedded as a literal array
  (fine to a few thousand terms — the plan ships it once per executor).
- `scan_mentions_udf` is the big-gazetteer path: one mapInPandas pass with a
  sc.broadcast term map, vectorized over the batch-flattened token array
  (tagger.kept_ngram_spans); still zero shuffle, Arrow-batched.
Both return the same rows; tests assert equality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cliner_spark.tokenization import tokens_col

MAX_TERM_TOKENS = 4

_CAND_TYPE = "array<struct<tok_start:int,tok_end:int,term:string>>"


def _ngram_candidates(tokens: Column, n: int, start_mask: Column) -> Column:
    """Candidates of exactly n tokens starting at a masked-in position:
    struct(tok_start, tok_end, lower term).

    start_mask is a per-position boolean array (first-token-of-some-term
    membership). Filtering start positions BEFORE building the n-gram string
    is the whole performance story: without it every position pays a
    concat_ws + full-term array_contains; with it only plausible starts do
    (one boolean element_at per position instead).
    """
    sz = F.size(tokens)
    starts = F.filter(
        F.sequence(F.lit(0), sz - n), lambda i: F.element_at(start_mask, i + 1)
    )
    return F.when(
        sz >= n,
        F.transform(
            starts,
            lambda i: F.struct(
                i.cast("int").alias("tok_start"),
                (i + n - 1).cast("int").alias("tok_end"),
                F.lower(F.concat_ws(" ", F.slice(tokens, i + 1, n))).alias("term"),
            ),
        ),
    ).otherwise(F.array().cast(_CAND_TYPE))


def _dominance_keep(matched: Column) -> Column:
    """Keep candidates not dominated by any overlapping longer/earlier one."""

    def better(o: Column, c: Column) -> Column:
        o_len = o["tok_end"] - o["tok_start"]
        c_len = c["tok_end"] - c["tok_start"]
        overlap = (o["tok_start"] <= c["tok_end"]) & (o["tok_end"] >= c["tok_start"])
        return overlap & (
            (o_len > c_len) | ((o_len == c_len) & (o["tok_start"] < c["tok_start"]))
        )

    return F.filter(matched, lambda c: ~F.exists(matched, lambda o: better(o, c)))


def scan_mentions_expr(
    turns: DataFrame,
    terms: list[str],
    text_col: str = "text",
    max_n: int = MAX_TERM_TOKENS,
) -> DataFrame:
    """Pure-expression scan. `terms` is the distinct lowercase gazetteer
    surface-form list (small: embedded as a literal array in the plan).

    Returns mentions(conv_id, turn_idx, tok_start, tok_end, mention_text)
    where mention_text is the original-case token slice (text-equality
    invariant: no normalization leaks into stored mentions).
    """
    term_set = sorted({t.lower() for t in terms})
    term_arr = F.array(*[F.lit(t) for t in term_set])
    first_words = sorted({t.split()[0] for t in term_set})
    fw_arr = F.array(*[F.lit(w) for w in first_words])
    # lengths that actually occur in the gazetteer — no wasted n passes
    ns = sorted({len(t.split()) for t in term_set if len(t.split()) <= max_n})

    # one boolean per token: could a term start here? (computed once per turn)
    start_mask = F.transform(
        F.col("tokens"), lambda t: F.array_contains(fw_arr, F.lower(t))
    )
    cands = F.flatten(
        F.array(
            *[_ngram_candidates(F.col("tokens"), n, F.col("_fw_mask")) for n in ns]
        )
    )
    matched = F.filter(cands, lambda c: F.array_contains(term_arr, c["term"]))

    return (
        turns.withColumn("tokens", tokens_col(text_col))
        .withColumn("_fw_mask", start_mask)
        .withColumn("m", F.explode(_dominance_keep(matched)))
        .select(
            "conv_id",
            "turn_idx",
            F.col("m.tok_start").alias("tok_start"),
            F.col("m.tok_end").alias("tok_end"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("tokens"),
                    F.col("m.tok_start") + 1,
                    F.col("m.tok_end") - F.col("m.tok_start") + 1,
                ),
            ).alias("mention_text"),
        )
    )


def scan_mentions_udf(
    turns: DataFrame,
    gazetteer_terms: list[str],
    text_col: str = "text",
    max_n: int = MAX_TERM_TOKENS,
    carry_ts: bool = False,
) -> DataFrame:
    """Big-gazetteer scan: mapInPandas + sc.broadcast term map, fully
    vectorized via tagger.kept_ngram_spans (pandas shift+concat n-gram match
    over the batch-flattened token array + turn-segmented dominance) — no
    per-row Python loop inside the Arrow batch. Same dominance semantics as
    scan_mentions_expr; tests assert row equality. Zero shuffle.

    carry_ts=True passes the event-time `ts` column through (streaming path:
    avoids a stream-stream self-join to re-attach event time downstream).
    """
    import numpy as np

    from cliner_spark.tagger import flatten_batch, kept_ngram_spans

    spark = turns.sparkSession
    term_map = {t.lower(): t.lower() for t in gazetteer_terms}
    b_terms = spark.sparkContext.broadcast((term_map, max_n))

    cols = ["conv_id", "turn_idx", text_col] + (["ts"] if carry_ts else [])
    schema = (
        "conv_id string, turn_idx int, tok_start int, tok_end int, mention_text string"
        + (", ts timestamp" if carry_ts else "")
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmap, mx = b_terms.value
        for pdf in batches:
            flat, turn_ids, lengths = flatten_batch(pdf[text_col])
            ks, kln, _ = kept_ngram_spans(flat.str.lower(), turn_ids, tmap, mx)
            # flat token index -> (batch row, in-turn token offset)
            offsets = np.concatenate(([0], np.cumsum(lengths)[:-1])).astype(np.int64)
            row = turn_ids[ks] if len(ks) else np.zeros(0, dtype=np.int64)
            tok_start = ks - offsets[row]
            # original-case mention text, vectorized per span length
            flat_np = flat.to_numpy(dtype=object)
            texts_out = np.empty(len(ks), dtype=object)
            for n in np.unique(kln):
                sel = kln == n
                base = pd.Series(flat_np[ks[sel]], dtype="object")
                rest = [
                    pd.Series(flat_np[ks[sel] + j], dtype="object")
                    for j in range(1, int(n))
                ]
                texts_out[sel] = (
                    base.str.cat(rest, sep=" ") if rest else base
                ).to_numpy(dtype=object)
            data = {
                "conv_id": pd.Series(
                    pdf["conv_id"].to_numpy(dtype=object)[row], dtype="object"
                ),
                "turn_idx": pd.Series(
                    pdf["turn_idx"].to_numpy()[row], dtype="int32"
                ),
                "tok_start": pd.Series(tok_start, dtype="int32"),
                "tok_end": pd.Series(tok_start + kln - 1, dtype="int32"),
                "mention_text": pd.Series(texts_out, dtype="object"),
            }
            if carry_ts:
                data["ts"] = pd.Series(
                    pdf["ts"].to_numpy()[row], dtype="datetime64[us]"
                )
            yield pd.DataFrame(data)

    return turns.select(*cols).mapInPandas(scan, schema=schema)
