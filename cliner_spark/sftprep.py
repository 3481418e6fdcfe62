"""SFT training-prep operators over transcript frames.

Input shape everywhere: a transcript DataFrame with at least
(conv_id: string, turn_idx: int, role: string, n_toks: long) — the
input_hint table shape plus a per-turn token count (text optional, only
render_chat needs it). All three operators are pure DataFrame transforms:
per-conversation windows + one partial-aggregated groupBy, no UDFs, no
driver collects — at scale they ride the transcript table's conv-hash
partitioning (one hash-partitioned window sort each, never a global sort).

Determinism contracts (the properties the replica tests pin):
- loss_mask_spans: span offsets derive from a running sum in turn order;
  adjacent masked turns merge via gaps-and-islands.
- truncate_to_budget: keeps the maximal SUFFIX of turns fitting the budget,
  never splitting inside a turn; a conversation whose last turn alone
  exceeds the budget yields no row (empty context).
- render_chat: the rendered string is built from an in-row array_sort of
  (turn_idx, line) structs — byte-identical output regardless of partition
  or collect order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def loss_mask_spans(txr: DataFrame, keep_role: str = "assistant") -> DataFrame:
    """Token spans to LOSS-MASK for SFT: every run of consecutive turns
    whose role != keep_role, as [span_start_tok, span_end_tok) offsets into
    the conversation's concatenated token stream."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    off = txr.select(
        "conv_id", "turn_idx", "role", "n_toks",
        F.coalesce(
            F.sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("tok_start"),
    )
    msk = off.filter(F.col("role") != keep_role).withColumn(
        "isl", F.col("turn_idx") - F.row_number().over(w)
    )
    return msk.groupBy("conv_id", "isl").agg(
        F.min("tok_start").alias("span_start_tok"),
        F.max(F.col("tok_start") + F.col("n_toks")).alias("span_end_tok"),
        F.count(F.lit(1)).alias("n_turns_merged"),
        F.sum("n_toks").alias("n_masked_toks"),
    ).drop("isl")


def truncate_to_budget(txr: DataFrame, budget: int = 256) -> DataFrame:
    """Per conversation: the maximal suffix of turns with total n_toks <=
    budget (chat-history clipping at turn boundaries)."""
    base = txr.localCheckpoint(eager=True)
    w_rev = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev = base.select(
        "conv_id", "turn_idx", "n_toks",
        F.sum("n_toks").over(w_rev).cast("long").alias("sfx_toks"),
    )
    tot = base.groupBy("conv_id").agg(F.sum("n_toks").alias("total_toks"))
    return (
        rev.filter(F.col("sfx_toks") <= budget)
        .join(tot, "conv_id")
        .groupBy("conv_id")
        .agg(
            F.min("turn_idx").cast("int").alias("first_kept_turn"),
            F.count(F.lit(1)).alias("n_kept_turns"),
            F.sum("n_toks").alias("kept_toks"),
            (F.max("total_toks") - F.sum("n_toks")).alias("dropped_toks"),
        )
    )


def render_chat(txr: DataFrame) -> DataFrame:
    """Deterministic chat-template render per conversation: '<|role|>text'
    lines joined by newline in turn order, reported as (n_turns, n_chars,
    render_md5) — md5 so a hash check proves the training text is
    byte-identical across engines/partitionings."""
    line = F.concat(F.lit("<|"), F.col("role"), F.lit("|>"), F.col("text"))
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("turn_idx"), line.alias("s")))),
            lambda x: x["s"],
        ),
        "\n",
    )
    return txr.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.length(rendered).cast("long").alias("n_chars"),
        F.md5(rendered).alias("render_md5"),
    )
