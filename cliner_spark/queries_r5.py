"""Round-5 query registrations.

Same contract as queries_r2/r3/r4: every @register pairs a Spark DataFrame
plan with a DuckDB ANSI-SQL oracle twin over the driver's parquet tables,
column names/types aligned on both sides. Chained off queries_r4's tail so
the import chain entry_queries -> r2 -> r3 -> r4 -> r5 stays cycle-safe;
R5_NAMES feeds the round-5 driver window (see
entry_queries.ordered_registry — round 5 deliberately caps new
registrations at THREE so the 50-row correctness window spends its slots
retiring the never-driver-checked backlog, per the round-4 verdict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from cliner_spark.entry_queries import (  # noqa: F401
    REGISTRY,
    SQL_EMB,
    load,
    load_docs,
    register,
)

# Names registered by this module, in driver-verification priority order.
R5_NAMES: list[str] = []


def _register_r5(name: str, sql: str | None):
    """@register that also appends to R5_NAMES (driver-window priority)."""

    def deco(fn):
        R5_NAMES.append(name)
        return register(name, sql)(fn)

    return deco


# --------------------------------------------------------------------------
# Round 5a: GIF decode (round-4 verdict item 6 — one more stdlib codec).
# Every document becomes a REAL GIF89a payload (palette + canonical GIF
# LZW, multimodal.encode_gif) and decode_media runs the real decoder
# distributed; the oracle never touches the image bytes — it recomputes
# the pixel stats analytically from the same md5 stream, so a palette /
# LZW width-change / sub-block framing bug in EITHER direction breaks the
# px_sha256 hash.
# --------------------------------------------------------------------------

_GIF_DECODE_SQL = """
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
       'gif' AS fmt,
       CAST(s.w AS INT) AS width, CAST(s.h AS INT) AS height,
       CAST(s.nb AS BIGINT) AS n_px_bytes,
       sha256(s.sh) AS px_sha256,
       CAST(sums.sum_r AS BIGINT) AS sum_r,
       CAST(sums.sum_g AS BIGINT) AS sum_g,
       CAST(sums.sum_b AS BIGINT) AS sum_b
FROM s JOIN sums USING (doc_id)
"""


@_register_r5("q_gif_decode", _GIF_DECODE_SQL)
def q_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed REAL GIF decode: documents -> genuine GIF89a payloads
    (distinct-color palette, canonical GIF LZW with late code-width
    change, 255-byte sub-block framing; multimodal.encode_gif) -> the
    stdlib-only LZW decoder -> exact per-image channel sums + sha256 of
    the decoded top-down RGB stream. Same encode-decode-cannot-cancel
    argument as q_media_decode: the DuckDB twin computes the stats
    ANALYTICALLY from the md5 pixel stream without reading a single GIF
    byte, so a matched px_sha256 proves decode(encode(stream)) == stream
    through real format bytes (palette indexing, variable-width LSB-first
    code packing, clear/end codes, dictionary growth).

    Scale plan: encode+decode fuse into one mapInPandas stage over
    doc-partitioned input — zero shuffle, no collect; same plan shape as
    q_media_decode with the codec swapped."""
    from cliner_spark.multimodal import decode_media, synth_gif_table

    return decode_media(synth_gif_table(load_docs(spark, sf_dir)))


# --------------------------------------------------------------------------
# Round 5b: LOO k-NN eval over IVF candidates (round-4 verdict item 3 —
# the scale path for q_knn_loo_eval's all-pairs brute force). Same
# micro-unit distance, same voting algebra, candidates restricted to each
# vector's 4 probed seeded-IVF cells.
# --------------------------------------------------------------------------

_KNN_ANN_K = 5

# _sql_cos shape (rounded cosine) must match similarity.cosine_sim exactly
_ANN_COS = (
    "round(list_sum(list_transform(range(64), i -> e.v[i+1] * s.centroid[i+1]))"
    " / sqrt(list_sum(list_transform(e.v, x -> x * x))"
    " * list_sum(list_transform(s.centroid, x -> x * x))), 6)"
)

_KNN_ANN_SQL = f"""
WITH {SQL_EMB},
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
         AS INTEGER) - 1 AS cell, v AS centroid
  FROM (SELECT * FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
),
ssims AS (
  SELECT e.vec_id, s.cell, {_ANN_COS} AS csim
  FROM e CROSS JOIN seeds s
),
scells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY csim DESC, cell ASC) AS r FROM ssims) WHERE r = 1
),
aprobes AS (
  SELECT vec_id AS qid, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
           ORDER BY csim DESC, cell ASC) AS r FROM ssims) WHERE r <= 4
),
micro AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 1e6) AS BIGINT)) AS q
  FROM embeddings
),
cand AS (
  SELECT p.qid, c.vec_id AS nid
  FROM aprobes p JOIN scells c USING (cell)
  WHERE c.vec_id <> p.qid
),
pairs AS (
  SELECT cand.qid, a.label AS true_label, cand.nid, b.label AS n_label,
         CAST(list_sum(list_transform(range(64),
              i -> (a.q[CAST(i AS INT) + 1] - b.q[CAST(i AS INT) + 1])
                   * (a.q[CAST(i AS INT) + 1] - b.q[CAST(i AS INT) + 1])))
              AS BIGINT) AS d2
  FROM cand JOIN micro a ON a.vec_id = cand.qid
            JOIN micro b ON b.vec_id = cand.nid
),
cover AS (
  SELECT qid, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY 1
),
top AS (
  SELECT qid, true_label, n_label
  FROM (SELECT qid, true_label, n_label,
               row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
        FROM pairs) r
  WHERE rn <= {_KNN_ANN_K}
),
votes AS (
  SELECT qid, true_label, n_label, CAST(count(*) AS BIGINT) AS c
  FROM top GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, true_label, n_label AS pred_label
  FROM (SELECT qid, true_label, n_label,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, n_label)
                 AS rn
        FROM votes) v
  WHERE rn = 1
)
SELECT CAST(p.true_label AS BIGINT) AS true_label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN p.pred_label = p.true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(CAST(sum(CASE WHEN p.pred_label = p.true_label THEN 1 ELSE 0
                  END) AS DOUBLE) / count(*), 6) AS accuracy,
       CAST(min(cv.n_cand) AS BIGINT) AS min_cands,
       round(CAST(sum(cv.n_cand) AS DOUBLE) / count(*), 6) AS avg_cands
FROM pred p JOIN cover cv ON cv.qid = p.qid
GROUP BY p.true_label
"""


@_register_r5("q_knn_loo_ann", _KNN_ANN_SQL)
def q_knn_loo_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN classification over IVF CANDIDATES — the scale
    path the q_knn_loo_eval docstring promised (round-4 verdict item 3):
    identical exact micro-unit squared distance, identical (d2, vec_id)
    rank pins and plurality-ties-to-smallest-label voting, but each
    vector's neighbor pool is restricted to its 4 best seeded-IVF cells
    (the hash-verifiable deterministic quantizer of q_embedding_ivf_seeded)
    instead of the full corpus. Per-label rows additionally carry the
    candidate-coverage audit (min/avg candidates per query) so shrinking
    recall is visible in the ledger, and tests/test_queries_r5.py asserts
    the prediction agreement rate vs the brute-force gate.

    Scale plan: the all-pairs theta join becomes probes(4N rows) equi-
    joined to the cell-partitioned corpus — the IVF candidate shape, ~
    n_probe/n_lists of the brute-force pair count. At 10^12 vectors
    n_lists grows ~sqrt(N) (and the cell key gets salted per the skew
    audit), shrinking the fraction further; ranking partitions by query,
    voting collapses map-side. The 16-cell fixture keeps the DuckDB twin
    exact."""
    from cliner_spark.similarity import cosine_sim, seeded_cells

    emb = load(spark, sf_dir, "embeddings")
    cent_df, assigned = seeded_cells(emb)
    micro = emb.select(
        "vec_id", "label",
        F.expr(
            "transform(cast(embedding AS array<double>), "
            "x -> CAST(round(x * 1e6) AS BIGINT))"
        ).alias("q"),
    )
    # per-vector top-4 probed cells (same desc(csim), asc(cell) order as
    # the scells assignment)
    qc = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    ).crossJoin(F.broadcast(cent_df)).withColumn(
        "csim", cosine_sim(F.col("qv"), F.col("centroid"))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cell"))
    probes = (
        qc.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= 4)
        .select("qid", "cell")
    )
    cand = (
        probes.join(
            assigned.select(F.col("vec_id").alias("nid"), "cell"), "cell"
        )
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid")
    )
    a = micro.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("true_label"),
        F.col("q").alias("qa"),
    )
    b = micro.select(
        F.col("vec_id").alias("nid"), F.col("label").alias("n_label"),
        F.col("q").alias("qb"),
    )
    pairs = cand.join(a, "qid").join(b, "nid").select(
        "qid", "true_label", "nid", "n_label",
        F.expr(
            "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("d2"),
    )
    cover = cand.groupBy("qid").agg(
        F.count("*").cast("bigint").alias("n_cand")
    )
    top = pairs.select(
        "qid", "true_label", "n_label",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy("d2", "nid"))
        .alias("rn"),
    ).filter(F.col("rn") <= _KNN_ANN_K)
    votes = top.groupBy("qid", "true_label", "n_label").agg(
        F.count("*").cast("bigint").alias("c")
    )
    pred = votes.select(
        "qid", "true_label",
        F.col("n_label").alias("pred_label"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.col("c").desc(), "n_label"))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return pred.join(cover, "qid").groupBy(
        F.col("true_label").cast("bigint").alias("true_label")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("accuracy"),
        F.min("n_cand").cast("bigint").alias("min_cands"),
        F.round(F.sum("n_cand").cast("double") / F.count("*"), 6).alias(
            "avg_cands"
        ),
    )


# --------------------------------------------------------------------------
# Round 5c: baseline JPEG decode — the round-4 verdict's named
# "stdlib-feasible next step" beyond GIF. The fixture images are
# BLOCK-CONSTANT (each 8x8 block one md5-derived color), the domain where
# baseline JPEG with an all-ones quant table is exactly lossless (DC-only
# spectra, integer DC = 8*(v-128)), so the analytic oracle can hash the
# decoded stream without ever running a DCT: a real entropy-layer or
# marker bug (Huffman tables, DC prediction, EXTEND, byte stuffing)
# breaks px_sha256.
# --------------------------------------------------------------------------

_JPEG_DECODE_SQL = """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 2 AS wb, 1 + doc_id % 3 AS hb,
         md5(coalesce(text, '')) AS hx
  FROM documents
),
s AS (
  SELECT doc_id, wb, hb, 8 * wb AS w, 8 * hb AS h,
         8 * wb * 8 * hb * 3 AS nb,
         repeat(hx, 3) AS sh
  FROM d
),
px AS (
  SELECT doc_id, CAST(t.i AS BIGINT) % 3 AS ch,
         ((CAST(t.i AS BIGINT) // (3 * w)) // 8) * wb
           + ((CAST(t.i AS BIGINT) // 3) % w) // 8 AS bi,
         CAST(t.i AS BIGINT) AS i, sh
  FROM s, unnest(range(nb)) AS t(i)
),
b AS (
  SELECT doc_id, ch, i,
         substr(sh, CAST((3 * bi + ch) * 2 + 1 AS INT), 2) AS hx2
  FROM px
),
v AS (
  SELECT doc_id, ch, i,
         (strpos('0123456789abcdef', substr(hx2, 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(hx2, 2, 1)) - 1) AS v,
         hx2
  FROM b
),
sums AS (
  SELECT doc_id,
         sum(CASE WHEN ch = 0 THEN v END) AS sum_r,
         sum(CASE WHEN ch = 1 THEN v END) AS sum_g,
         sum(CASE WHEN ch = 2 THEN v END) AS sum_b,
         string_agg(hx2, '' ORDER BY i) AS stream_hex
  FROM v GROUP BY doc_id
)
SELECT CAST(s.doc_id AS BIGINT) AS media_id,
       'jpeg' AS fmt,
       CAST(s.w AS INT) AS width, CAST(s.h AS INT) AS height,
       CAST(s.nb AS BIGINT) AS n_px_bytes,
       sha256(sums.stream_hex) AS px_sha256,
       CAST(sums.sum_r AS BIGINT) AS sum_r,
       CAST(sums.sum_g AS BIGINT) AS sum_g,
       CAST(sums.sum_b AS BIGINT) AS sum_b
FROM s JOIN sums USING (doc_id)
"""


@_register_r5("q_jpeg_decode", _JPEG_DECODE_SQL)
def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed REAL baseline-JPEG decode: documents -> genuine ITU-T
    T.81 SOF0 payloads (markers, embedded canonical Huffman tables, DC
    prediction, zero-run AC coding, 0xFF byte stuffing, all-ones DQT,
    Adobe APP14 RGB mode; multimodal.encode_jpeg) -> the stdlib+numpy
    decoder (Huffman decode, EXTEND, dequant, 8x8 IDCT) -> exact
    per-image channel sums + sha256 of the decoded top-down RGB stream.
    The fixture pixels are block-constant, the provably-lossless JPEG
    domain, so the DuckDB twin computes the stats ANALYTICALLY from the
    md5 block colors — decode(encode(stream)) == stream is proven through
    a real lossy-capable codec operating where it is exact.

    Scale plan: encode+decode fuse into one mapInPandas stage over
    doc-partitioned input — zero shuffle, no collect; same plan shape as
    q_media_decode / q_gif_decode with the codec swapped."""
    from cliner_spark.multimodal import decode_media, synth_jpeg_table

    return decode_media(synth_jpeg_table(load_docs(spark, sf_dir)))
