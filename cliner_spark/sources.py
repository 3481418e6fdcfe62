"""Gazetteer ETL (SURVEY.md S5; reference analog:
code/feature_extraction/umls_dir/create_sqliteDB.py, approx/unverified §0).

The reference builds a SQLite string->CUI/TUI store from UMLS RRF files
(MRCONSO.RRF / MRSTY.RRF — pipe-separated, no header). Here the same ETL is
one Spark job: RRF-as-CSV scan -> project/dedupe/join -> gazetteer parquet,
which then broadcasts into the linking stage. At 100 TB-corpus scale the
gazetteer remains dimension-sized (UMLS ~ millions of rows) — one shuffle on
cui to join concept strings with semantic types, then a coalesced write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# MRCONSO.RRF columns (subset we use, 0-based positions in the 18-col format)
_CONSO_COLS = {0: "cui", 1: "lat", 2: "ts", 4: "pref", 11: "sab", 14: "str"}
# MRSTY.RRF: cui, tui, stn, sty, atui, cvf
_STY_COLS = {0: "cui", 1: "tui", 3: "sty"}


def read_rrf(spark: SparkSession, path: str, col_map: dict[int, str]) -> DataFrame:
    """Read a pipe-separated RRF file (no header, trailing '|')."""
    df = spark.read.csv(path, sep="|", header=False)
    return df.select(
        *[F.col(f"_c{i}").alias(name) for i, name in col_map.items()]
    )


def build_gazetteer(
    spark: SparkSession,
    mrconso_path: str,
    mrsty_path: str,
    languages: tuple[str, ...] = ("ENG",),
    type_map: dict[str, str] | None = None,
) -> DataFrame:
    """MRCONSO + MRSTY -> gazetteer(term, cui, sem_type, canonical, score).

    - term: lowercase concept string (one row per distinct (term, cui))
    - canonical: the concept's preferred string (TS='P' row), lowercase
    - sem_type: mapped from the semantic-type name via type_map (defaults to
      the i2b2 3-way problem/test/treatment buckets); unmapped types dropped
    - score: 0.99 for preferred strings, 0.7 otherwise (deterministic)
    """
    type_map = type_map if type_map is not None else DEFAULT_TYPE_MAP
    conso = read_rrf(spark, mrconso_path, _CONSO_COLS).filter(
        F.col("lat").isin(*languages)
    )
    sty = read_rrf(spark, mrsty_path, _STY_COLS)

    map_expr = F.create_map(
        *[F.lit(x) for pair in type_map.items() for x in pair]
    )
    typed = (
        sty.withColumn("sem_type", map_expr[F.col("sty")])
        .filter(F.col("sem_type").isNotNull())
        .select("cui", "sem_type")
        .distinct()
    )

    pref = (
        conso.filter(F.col("ts") == "P")
        .groupBy("cui")
        .agg(F.min(F.lower("str")).alias("canonical"))
    )
    terms = conso.select(
        "cui",
        F.lower("str").alias("term"),
        F.when(F.col("ts") == "P", F.lit(0.99)).otherwise(F.lit(0.7)).alias("score"),
    ).groupBy("cui", "term").agg(F.max("score").alias("score"))

    return (
        terms.join(typed, "cui")
        .join(pref, "cui", "left")
        .withColumn("canonical", F.coalesce("canonical", "term"))
        .select("term", "cui", "sem_type", "canonical", "score")
    )


DEFAULT_TYPE_MAP = {
    "Disease or Syndrome": "problem",
    "Sign or Symptom": "problem",
    "Pathologic Function": "problem",
    "Neoplastic Process": "problem",
    "Mental or Behavioral Dysfunction": "problem",
    "Injury or Poisoning": "problem",
    "Laboratory Procedure": "test",
    "Diagnostic Procedure": "test",
    "Laboratory or Test Result": "test",
    "Therapeutic or Preventive Procedure": "treatment",
    "Pharmacologic Substance": "treatment",
    "Clinical Drug": "treatment",
    "Antibiotic": "treatment",
}
