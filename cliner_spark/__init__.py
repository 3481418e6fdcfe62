"""cliner_spark — a from-scratch PySpark-native knowledge-graph construction
pipeline with the query/data-processing capabilities of renan-campos/CliNER
(clinical concept extraction), recast as triple extraction + entity linking +
canonicalization over tables of multi-turn conversation transcripts.

Reference semantics (i2b2 2010 concept extraction: IOB tagging over
line-tokenized notes, gazetteer/lexical features, exact+overlap span eval)
are reconstructed in SURVEY.md; the reference checkout was empty, so
citations are to the public CliNER codebase (approx, see SURVEY.md §0).

Design: DataFrame-first. Every stage is declared with pyspark.sql built-ins
where semantics allow (Catalyst handles pushdown/pruning/join strategy/AQE);
Python crosses the JVM boundary only in four Arrow-vectorized UDFs
(tokenize-with-offsets, feature+Viterbi tagging, IOB chunking, trie
longest-match scanning) — never per-row Python.
"""

__version__ = "0.1.0"
