"""Per-corpus materialized-artifact cache (similarity graph, KG triples,
IVF index).

Production shape: these artifacts are Iceberg tables keyed by corpus
snapshot id — a new corpus release is a new snapshot, consumers always read
the snapshot they were planned against. In-sandbox we model that with a
parquet directory per (artifact kind, corpus fingerprint):

- the cache key includes a CONTENT FINGERPRINT of the corpus directory
  (relative path, byte size, mtime_ns of every *.parquet file), so
  regenerating the corpus in place yields a different key and can never
  serve stale edges/triples/cells against a fresh DuckDB oracle;
- artifacts live under a per-user cache root (~/.cache/cliner_spark, or
  $CLINER_CACHE_DIR), not the world-shared tempdir, so another local user
  cannot pre-plant a parquet that flows into query results;
- builds write to a unique scratch path and atomically rename into place,
  so concurrent processes either see the complete artifact or build their
  own — never a half-written directory.

(Round-3 ADVICE, medium: queries_r2._docpair_edges cache-poisoning /
staleness / race.)
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def cache_root() -> str:
    root = os.environ.get("CLINER_CACHE_DIR")
    if not root:
        root = os.path.join(
            os.path.expanduser("~"), ".cache", "cliner_spark"
        )
    os.makedirs(root, exist_ok=True)
    return root


def corpus_fingerprint(sf_dir: str) -> str:
    """md5 over the sorted (relpath, size, mtime_ns) triples of every
    parquet file under sf_dir — cheap (stat only, no reads) and changes
    whenever any input file is rewritten, even in place."""
    entries = []
    base = os.path.abspath(sf_dir)
    for dirpath, _dirs, files in sorted(os.walk(base)):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            entries.append(
                f"{os.path.relpath(p, base)}:{st.st_size}:{st.st_mtime_ns}"
            )
    h = hashlib.md5()
    h.update(base.encode())
    for e in entries:
        h.update(b"\0")
        h.update(e.encode())
    return h.hexdigest()[:16]


def artifact_path(kind: str, sf_dir: str, version: str) -> str:
    key = hashlib.md5(
        f"{corpus_fingerprint(sf_dir)}:{version}".encode()
    ).hexdigest()[:12]
    return os.path.join(cache_root(), f"{kind}_{key}")


def materialize(spark: SparkSession, path: str, build) -> DataFrame:
    """Return spark.read.parquet(path), building it first via
    build() -> DataFrame if absent. Build goes to a unique scratch dir then
    os.rename()s into place (atomic on one filesystem); on a lost race the
    scratch copy is discarded and the winner's artifact is read."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        scratch = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        build().write.mode("overwrite").parquet(scratch)
        try:
            os.rename(scratch, path)
        except OSError:
            # another process completed the same artifact first
            shutil.rmtree(scratch, ignore_errors=True)
    return spark.read.parquet(path)
