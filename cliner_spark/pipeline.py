"""End-to-end KG construction pipeline (SURVEY.md §3.1 equivalent lifecycle):

  transcripts -> drop blank turns -> mention scan (zero-shuffle) ->
  entity link (broadcast) -> canonicalize (CC on the dim graph) ->
  triples (unionByName of four projections) -> salted, sorted sink

spark-submit entry:
  spark-submit --py-files dist/cliner_spark.zip -m? (use bin script)
  python -m cliner_spark.pipeline --input <parquet> --gazetteer builtin \
      --output /tmp/triples

Shuffle audit (scale rationale, 10^12 turns):
  - scan: 0 shuffles (per-turn array expressions / mapInPandas)
  - link: 0 shuffles on the fact side (broadcast join; dim-side window is
    dimension-sized)
  - canonicalize: CC iterations shuffle only the cui graph (dim-sized)
  - triples: 2 aggregations (MENTIONS, SAME_AS dedup) + 1 distinct
    (ASSERTED_IN) over mention-grain data — orders of magnitude smaller than
    the turn stream; AQE coalesces
  - sink: 1 repartition by salted conv-hash
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import DataFrame, SparkSession

from cliner_spark import fixtures
from cliner_spark.canonicalize import canonical_concept_map
from cliner_spark.link import link_mentions
from cliner_spark.mentions import scan_mentions_expr, scan_mentions_udf
from cliner_spark.tokenization import drop_blank_turns
from cliner_spark.triples import build_triples, hot_conversations, write_triples


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    gazetteer: DataFrame | None = None,
    scanner: str = "expr",
    canon_map: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Returns dict with mentions, linked, canon_map, triples DataFrames.

    canon_map: optionally pass the precomputed concept-canonicalization map
    (a gazetteer-version artifact — dimension-sized, independent of the turn
    stream; production computes it once per gazetteer release, not per batch).
    """
    gaz = gazetteer if gazetteer is not None else fixtures.gazetteer_df(spark)
    terms = [r["term"] for r in gaz.select("term").distinct().collect()]

    from cliner_spark.session import ensure_parallelism

    turns = drop_blank_turns(ensure_parallelism(transcripts))
    if scanner == "expr":
        mentions = scan_mentions_expr(turns, terms)
    elif scanner == "udf":
        mentions = scan_mentions_udf(turns, terms)
    elif scanner == "tagger":
        # Viterbi tagger path (SURVEY.md §7.1 step 3): features -> batched
        # Viterbi decode -> IOB chunking, distant-supervision model. Output
        # spans provably equal the gazetteer scan on gazetteer-planted text,
        # so the same P/R contract holds; drop its concept_type and let
        # link_mentions re-derive it (single source of truth).
        from cliner_spark.tagger import make_distant_model, tag_mentions

        entries = [
            (r["term"], r["cui"], r["sem_type"], r["canonical"], r["score"])
            for r in gaz.collect()
        ]
        mentions = tag_mentions(turns, make_distant_model(entries)).drop("concept_type")
    else:
        raise ValueError(f"unknown scanner {scanner!r}")

    linked = link_mentions(mentions, gaz)
    if canon_map is None:
        canon_map = canonical_concept_map(gaz)
    triples = build_triples(linked, canon_map=canon_map)
    return {
        "mentions": mentions,
        "linked": linked,
        "canon_map": canon_map,
        "triples": triples,
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="cliner_spark KG pipeline")
    ap.add_argument("--input", help="parquet path of transcripts (default: built-in fixture)")
    ap.add_argument("--output", required=True, help="output parquet path for triples")
    ap.add_argument("--scanner", default="udf", choices=["expr", "udf", "tagger"])
    ap.add_argument("--master", default=None)
    ap.add_argument("--hot-threshold", type=int, default=100_000)
    args = ap.parse_args(argv)

    from cliner_spark.session import get_spark

    spark = get_spark("cliner_spark.pipeline", master=args.master)
    if args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = fixtures.transcripts_df(spark)

    t0 = time.time()
    out = run_pipeline(spark, transcripts, scanner=args.scanner)
    hot = hot_conversations(transcripts, threshold=args.hot_threshold)
    write_triples(out["triples"], args.output, hot=hot)
    n = spark.read.parquet(args.output).count()
    print(f"wrote {n} triples to {args.output} in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
