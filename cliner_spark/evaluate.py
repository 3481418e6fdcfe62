"""Span/triple evaluation (SURVEY.md J3/J4/U1/A1/A2; reference:
code/evaluate.py exact + inexact/overlap matching and P/R/F1, approx §0).

All pure DataFrame ops: TP/FP/FN via left_semi / left_anti joins; the overlap
("inexact") variant is an equi-join on (conv_id, turn_idx) with the interval
predicate applied as a post-join filter (Spark executes equi keys via
sort-merge/broadcast; the theta part never forces a cartesian product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXACT_KEYS = ["conv_id", "turn_idx", "tok_start", "tok_end", "concept_type"]


def exact_match_counts(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per concept_type TP/FP/FN under exact-span matching (J3/U1/A1)."""
    p = pred.select(*EXACT_KEYS).distinct()
    g = gold.select(*EXACT_KEYS).distinct()
    tp = p.join(g, EXACT_KEYS, "left_semi").groupBy("concept_type").agg(F.count(F.lit(1)).alias("tp"))
    fp = p.join(g, EXACT_KEYS, "left_anti").groupBy("concept_type").agg(F.count(F.lit(1)).alias("fp"))
    fn = g.join(p, EXACT_KEYS, "left_anti").groupBy("concept_type").agg(F.count(F.lit(1)).alias("fn"))
    types = p.select("concept_type").unionByName(g.select("concept_type")).distinct()
    return (
        types.join(tp, "concept_type", "left")
        .join(fp, "concept_type", "left")
        .join(fn, "concept_type", "left")
        .fillna(0, subset=["tp", "fp", "fn"])
    )


def overlap_match_counts(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Inexact (overlap) matching (J4): a predicted span counts as TP if any
    gold span of the same type on the same turn overlaps it. Double matches
    are not double-counted (semi-join semantics on each side independently,
    mirroring the reference's per-set counting)."""
    p = pred.select(*EXACT_KEYS).distinct()
    g = gold.select(*EXACT_KEYS).distinct()
    overlap = (
        (F.col("p.tok_start") <= F.col("g.tok_end"))
        & (F.col("p.tok_end") >= F.col("g.tok_start"))
    )
    cond = (
        (F.col("p.conv_id") == F.col("g.conv_id"))
        & (F.col("p.turn_idx") == F.col("g.turn_idx"))
        & (F.col("p.concept_type") == F.col("g.concept_type"))
        & overlap
    )
    p_hit = p.alias("p").join(g.alias("g"), cond, "left_semi")
    g_hit = g.alias("g").join(p.alias("p"), cond, "left_semi")
    tp = p_hit.groupBy("concept_type").agg(F.count(F.lit(1)).alias("tp"))
    fp = (
        p.alias("p").join(g.alias("g"), cond, "left_anti")
        .groupBy("concept_type").agg(F.count(F.lit(1)).alias("fp"))
    )
    fn = (
        g.alias("g").join(p.alias("p"), cond, "left_anti")
        .groupBy("concept_type").agg(F.count(F.lit(1)).alias("fn"))
    )
    types = p.select("concept_type").unionByName(g.select("concept_type")).distinct()
    out = (
        types.join(tp, "concept_type", "left")
        .join(fp, "concept_type", "left")
        .join(fn, "concept_type", "left")
        .fillna(0, subset=["tp", "fp", "fn"])
    )
    _ = g_hit  # recall-side TP equals gold-side semi count; fn covers it
    return out


def prf(counts: DataFrame) -> DataFrame:
    """P/R/F1 per class + micro row (concept_type='ALL') via rollup (A2)."""
    rolled = (
        counts.rollup("concept_type")
        .agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"))
        .withColumn("concept_type", F.coalesce(F.col("concept_type"), F.lit("ALL")))
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    out = rolled.withColumn("precision", p).withColumn("recall", r)
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("f1", f1)


def triple_prf(pred_triples: DataFrame, gold_triples: DataFrame) -> dict[str, float]:
    """Set P/R over (subj, pred, obj) triples — the BASELINE.json metric."""
    p = pred_triples.select("subj", "pred", "obj").distinct()
    g = gold_triples.select("subj", "pred", "obj").distinct()
    keys = ["subj", "pred", "obj"]
    tp = p.join(g, keys, "left_semi").count()
    np_, ng = p.count(), g.count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "n_pred": np_, "n_gold": ng, "precision": precision, "recall": recall, "f1": f1}


def kappa_from_confusion(cm: DataFrame) -> DataFrame:
    """Cohen's kappa from a confusion-count table (gold_type, pred_type, n).

    chance = sum over LABELS t of row_t * col_t (matching-label marginal
    products, per Cohen 1960); kappa = (N*agree - chance) / (N^2 - chance).
    Numerator and denominator are exact BIGINTs, so the final double is
    bit-identical in any engine/partitioning. The confusion table is
    types x types (tiny) — every aggregate here is dimension-sized."""
    cm = cm.localCheckpoint(eager=True)  # three tiny aggregates reuse it
    rowm = cm.groupBy(F.col("gold_type").alias("t")).agg(F.sum("n").alias("r"))
    colm = cm.groupBy(F.col("pred_type").alias("t")).agg(F.sum("n").alias("c"))
    chance = rowm.join(colm, "t").agg(F.sum(F.col("r") * F.col("c")).alias("chance"))
    marg = (
        cm.agg(
            F.sum("n").alias("n_aligned"),
            F.sum(
                F.when(F.col("gold_type") == F.col("pred_type"), F.col("n")).otherwise(0)
            ).alias("n_agree"),
        )
        .crossJoin(F.broadcast(chance))
    )
    return marg.select(
        F.col("n_aligned").cast("bigint").alias("n_aligned"),
        F.col("n_agree").cast("bigint").alias("n_agree"),
        (F.col("n_aligned") * F.col("n_agree") - F.col("chance"))
        .cast("bigint")
        .alias("kappa_num"),
        (F.col("n_aligned") * F.col("n_aligned") - F.col("chance"))
        .cast("bigint")
        .alias("kappa_den"),
        (
            (F.col("n_aligned") * F.col("n_agree") - F.col("chance")).cast("double")
            / (F.col("n_aligned") * F.col("n_aligned") - F.col("chance")).cast("double")
        ).alias("kappa"),
    )
