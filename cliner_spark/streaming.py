"""Structured Streaming surface: incremental transcript ingest -> mention
stream -> triple/metric sinks (SURVEY.md §2.9 notes this as the natural
extension of the batch contract; the batch pipeline stays authoritative).

Everything stateless (scan/link) runs unchanged in streaming mode — the same
mapInPandas / broadcast-join operators are reused, so batch/stream parity is
by construction. Stateful pieces (windowed mention counts) use event-time
watermarks for late data.

At scale: readStream from the Iceberg/parquet landing zone, per-source-file
micro-batches; the scan stage remains zero-shuffle, so throughput matches
the batch path; the windowed agg shuffles only mention-grain rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cliner_spark import schemas
from cliner_spark.link import link_mentions
from cliner_spark.mentions import scan_mentions_udf
from cliner_spark.tokenization import drop_blank_turns


def read_transcript_stream(spark: SparkSession, input_path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )


def streaming_mentions(stream: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Stateless streaming mention scan + link; keeps event time `ts`."""
    terms = [r["term"] for r in gazetteer.select("term").distinct().collect()]
    turns = drop_blank_turns(stream)
    scanned = scan_mentions_udf(turns, terms, carry_ts=True)
    return link_mentions(scanned, gazetteer)


def windowed_concept_counts(
    linked: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window concept counts with late-data watermark."""
    return (
        linked.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("cui"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cui",
            "n_mentions",
        )
    )


def run_stream_once(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    gazetteer: DataFrame,
    windowed: bool = False,
) -> None:
    """Drain all available input (Trigger.AvailableNow) into parquet.

    availableNow processes the backlog in rate-limited micro-batches then
    stops — the standard incremental-batch pattern; restarts resume from the
    checkpoint offsets (exactly-once into the file sink).
    """
    stream = read_transcript_stream(spark, input_path)
    linked = streaming_mentions(stream, gazetteer)
    out = windowed_concept_counts(linked) if windowed else linked
    mode = "append"  # file sink supports append; windowed agg emits finalized windows
    q = (
        out.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
