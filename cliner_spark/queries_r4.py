"""Round-4 query registrations.

Same contract as queries_r2/r3: every @register pairs a Spark DataFrame plan
with a DuckDB ANSI-SQL oracle twin over the driver's parquet tables, column
names/types aligned on both sides. Imported from queries_r3's tail so the
chain entry_queries -> queries_r2 -> queries_r3 -> queries_r4 stays
cycle-safe; R4_NAMES feeds the round-4 driver window AFTER the recertify
head and the never-checked rotation slice (see
entry_queries.ordered_registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cliner_spark.entry_queries import (  # noqa: F401
    REGISTRY,
    load,
    load_docs,
    register,
)

# Names registered by this module, in driver-verification priority order.
R4_NAMES: list[str] = []


def _register_r4(name: str, sql: str | None):
    """@register that also appends to R4_NAMES (driver-window priority)."""

    def deco(fn):
        R4_NAMES.append(name)
        return register(name, sql)(fn)

    return deco


# --------------------------------------------------------------------------
# Round 4a: REAL multimodal decode (round-3 verdict item 4). The corpus
# carries genuine BMP/PNG payloads (built by synth_image_table from a
# deterministic md5 pixel stream); decode_media runs a real stdlib decoder
# distributed and emits exact pixel stats. The oracle never decodes — it
# recomputes the stats analytically from the same md5 stream, so any
# header/padding/row-order/filter/CRC bug in EITHER codec direction breaks
# the hash.
# --------------------------------------------------------------------------

_MEDIA_DECODE_SQL = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
         md5(coalesce(text, '')) AS hx
  FROM documents
),
s AS (
  SELECT doc_id, w, h, w * h * 3 AS nb,
         substr(repeat(hx, CAST((w * h * 3 + 15) // 16 AS INT)),
                1, w * h * 3 * 2) AS sh
  FROM d
),
b AS (
  SELECT doc_id, CAST(t.i AS BIGINT) % 3 AS ch,
         (strpos('0123456789abcdef',
                 substr(sh, CAST(2 * t.i + 1 AS INT), 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(sh, CAST(2 * t.i + 2 AS INT), 1)) - 1) AS v
  FROM s, unnest(range(nb)) AS t(i)
),
sums AS (
  SELECT doc_id,
         sum(CASE WHEN ch = 0 THEN v END) AS sum_r,
         sum(CASE WHEN ch = 1 THEN v END) AS sum_g,
         sum(CASE WHEN ch = 2 THEN v END) AS sum_b
  FROM b GROUP BY doc_id
)
SELECT CAST(s.doc_id AS BIGINT) AS media_id,
       CASE WHEN s.doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
       CAST(s.w AS INT) AS width, CAST(s.h AS INT) AS height,
       CAST(s.nb AS BIGINT) AS n_px_bytes,
       sha256(s.sh) AS px_sha256,
       CAST(sums.sum_r AS BIGINT) AS sum_r,
       CAST(sums.sum_g AS BIGINT) AS sum_g,
       CAST(sums.sum_b AS BIGINT) AS sum_b
FROM s JOIN sums USING (doc_id)
"""


@_register_r4("q_media_decode", _MEDIA_DECODE_SQL)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed REAL image decode: documents -> genuine BMP (even
    doc_id) / PNG (odd doc_id, filter type doc_id%5 so all five PNG
    scanline filters occur) -> stdlib decoder -> exact per-image channel
    sums + sha256 of the decoded top-down RGB stream.

    The DuckDB twin computes the same stats ANALYTICALLY from the md5 pixel
    stream without ever touching the image bytes — encoder and decoder bugs
    cannot cancel: a matched px_sha256 proves decode(encode(stream)) ==
    stream through real format bytes (BGR order, bottom-up rows, 4-byte row
    padding, zlib, filters, CRCs).

    Scale plan: encode+decode fuse into one mapInPandas stage over
    doc-partitioned input — zero shuffle, no collect; payloads stream
    through Arrow binary columns exactly as real crawled images would. The
    per-image Python cost is the codec itself (the honest cost of media
    decode); at 100 TB the same plan shape holds with the stdlib codec
    swapped for a native one."""
    from cliner_spark.multimodal import decode_media, synth_image_table

    return decode_media(synth_image_table(load_docs(spark, sf_dir)))


# --------------------------------------------------------------------------
# Round 4b: residual IVF-PQ (round-3 verdict item 6) — PQ over residuals
# (x − cell centroid), the true FAISS IVFADC encoding. Oracle replays the
# full stack: seeded cells -> residual frames -> seeded residual codebook ->
# codes -> per-(query, probed-cell) LUT -> ADC ranking.
# --------------------------------------------------------------------------

from cliner_spark.entry_queries import (  # noqa: E402
    SQL_EMB,
    SQL_RESIDUAL_CTES,
    SQL_SEEDED_TOPK,
)

_RESIDUAL_SQL_CTES = SQL_RESIDUAL_CTES


@_register_r4(
    "q_ivfpq_residual_topk",
    f"""
WITH {SQL_EMB.strip()},
{SQL_SEEDED_TOPK.strip()},
{_RESIDUAL_SQL_CTES.strip()}
SELECT query_id, neighbor_id, adist, rn FROM (
  SELECT query_id, neighbor_id, adist,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adist ASC, neighbor_id ASC) AS INTEGER) AS rn
  FROM radist
) WHERE rn <= 3
""",
)
def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ top-3 for queries vec_id < 20 — the true FAISS
    IVFADC encoding (Jégou et al. 2011): codes quantize x − anchor(cell)
    rather than x (anchor = the exact integer-micro-unit cell MEAN; see
    similarity.cell_mean_anchors for why the seeded representative vector
    is the wrong residual origin), and each query is scored in the
    residual frame of every
    probed cell via one per-cell LUT. Same candidate pruning and code
    budget as q_ivfpq_topk, strictly better use of the codewords (they
    model within-cell detail instead of re-encoding cell position).

    Scale plan: identical cell-equi-join shape as q_ivfpq_topk — residual
    formation is one broadcast join at index build; the per-(query, cell)
    residual probe spine is n_probe rows per query, broadcast. Raw vectors
    never read at query time."""
    from cliner_spark import similarity as _sim_mod
    from cliner_spark.session import ensure_parallelism

    emb = ensure_parallelism(load(spark, sf_dir, "embeddings"))
    return _sim_mod.ivfpq_residual_topk(
        emb, F.col("vec_id") < 20, k=3, n_lists=16, n_probe=4
    )


@_register_r4(
    "q_pq_residual_gain",
    f"""
WITH {SQL_EMB.strip()},
{SQL_SEEDED_TOPK.strip()},
{SQL_RESIDUAL_CTES.strip()},
sub AS (
  SELECT m.m, e.vec_id, e.v[m.m * 16 + 1 : m.m * 16 + 16] AS sv
  FROM e, (SELECT unnest(range(4)) AS m) m
),
cbr AS (
  SELECT m, sv,
         CAST(row_number() OVER (PARTITION BY m
              ORDER BY md5(m::VARCHAR || '#' || vec_id::VARCHAR), vec_id)
              AS INTEGER) - 1 AS code
  FROM sub
  QUALIFY code < 8
),
dist AS (
  SELECT s.vec_id, s.m,
         round(list_sum(list_transform(range(16),
               i -> (s.sv[i + 1] - c.sv[i + 1]) * (s.sv[i + 1] - c.sv[i + 1]))),
               6) AS d,
         row_number() OVER (PARTITION BY s.vec_id, s.m
              ORDER BY round(list_sum(list_transform(range(16),
                    i -> (s.sv[i + 1] - c.sv[i + 1])
                       * (s.sv[i + 1] - c.sv[i + 1]))), 6) ASC, c.code ASC)
              AS rn
  FROM sub s JOIN cbr c USING (m)
),
raw_rec AS (
  SELECT vec_id,
         round(((max(CASE WHEN m = 0 THEN d END)
               + max(CASE WHEN m = 1 THEN d END))
               + max(CASE WHEN m = 2 THEN d END))
               + max(CASE WHEN m = 3 THEN d END), 6) AS recon_err
  FROM dist WHERE rn = 1 GROUP BY vec_id
),
res_rec AS (
  SELECT vec_id,
         round(((max(CASE WHEN m = 0 THEN d END)
               + max(CASE WHEN m = 1 THEN d END))
               + max(CASE WHEN m = 2 THEN d END))
               + max(CASE WHEN m = 3 THEN d END), 6) AS recon_err
  FROM rbestd GROUP BY vec_id
)
SELECT 'raw' AS encoding,
       CAST(sum(CAST(round(recon_err * 1e6) AS BIGINT)) AS BIGINT)
         AS distortion_micro,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM raw_rec
UNION ALL
SELECT 'residual',
       CAST(sum(CAST(round(recon_err * 1e6) AS BIGINT)) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM res_rec
""",
)
def q_pq_residual_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization-distortion ledger raw-PQ vs residual-PQ: total
    reconstruction error (exact BIGINT micro-units, order-independent sum)
    of encoding the corpus with the same 4x3-bit budget, (a) on raw
    vectors, (b) on residuals to the exact cell-mean anchors. This is the
    deterministic form of the IVFADC claim — residual encoding spends the
    code budget on within-cell detail — and the table that justified the
    round-4 anchor fix: anchoring at the seeded representative VECTOR
    (a point on the sphere, not a mean) made distortion 35-48% WORSE;
    mean anchors recover a 5-10% reduction on this corpus (tests assert
    residual < raw).

    Scale plan: two corpus-scan encodings (each a narrow codegen
    projection with the codebook inlined) + one map-side-combinable
    (cell, dim) aggregation for anchors; output is 2 rows."""
    from cliner_spark import similarity as _sim_mod
    from cliner_spark.session import ensure_parallelism

    emb = ensure_parallelism(load(spark, sf_dir, "embeddings"))
    cb = _sim_mod.pq_codebook(emb)
    raw = _sim_mod.pq_codes(emb, cb)
    cents, assigned = _sim_mod.seeded_cells(emb, 16)
    anchors = _sim_mod.cell_mean_anchors(assigned)
    res = assigned.join(F.broadcast(anchors), "cell").select(
        F.col("vec_id"),
        F.zip_with(
            F.col("embedding"), F.col("anchor"), lambda x, y: x.cast("double") - y
        ).alias("_rv"),
    )
    rcb = _sim_mod.pq_codebook(res, vec_col="_rv")
    rcodes = _sim_mod.pq_codes(res, rcb, 64, "vec_id", "_rv")

    def _tot(codes: DataFrame, name: str) -> DataFrame:
        return codes.agg(
            F.sum(F.round(F.col("recon_err") * 1e6).cast("bigint"))
            .cast("bigint")
            .alias("distortion_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        ).select(F.lit(name).alias("encoding"), "distortion_micro", "n_vectors")

    return _tot(raw, "raw").unionAll(_tot(rcodes, "residual"))
