"""Similarity search over embedding columns (driver mandate).

- brute-force cosine top-k: broadcast the (small) query set against the full
  corpus; cosine in double precision via zip_with + left-fold aggregate
  (JVM-side, no Python). Scale path: the corpus side never shuffles; the
  query side is broadcast. Similarity is rounded to 6 dp BEFORE ranking so
  rankings are reproducible across engines/summation orders.
- LSH-bucketed variant: sign-random-projection buckets where the projection
  matrix is derived from md5 (deterministic, no RNG, engine-independent);
  candidates share a bucket; exact rerank inside the bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIM_DECIMALS = 6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / F.sqrt(_norm2(a) * _norm2(b)), SIM_DECIMALS)


def brute_force_topk(
    emb: DataFrame,
    query_filter: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for every row matching query_filter."""
    q = emb.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    j = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def _projection_sign(vec: Column, plane: int, dims: int) -> Column:
    """Sign of <vec, h_plane> where h_plane[d] = +1 if the first hex digit of
    md5('{plane}#{d}') < 8 else -1 (deterministic pseudo-random hyperplane).
    """
    weights = F.array(
        *[
            F.when(
                F.conv(F.substring(F.md5(F.lit(f"{plane}#{d}")), 1, 1), 16, 10).cast("int") < 8,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for d in range(dims)
        ]
    )
    proj = F.aggregate(
        F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj > 0).cast("int")


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-random-projection bucket id (0..2^n_planes-1)."""
    bucket = None
    for p in range(n_planes):
        bit = _projection_sign(F.col(vec_col), p, dims) * (2**p)
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ivf_topk(
    emb: DataFrame,
    query_filter: Column,
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into n_lists cells; each query exactly reranks only
    the n_probe nearest cells.

    Scale path: the centroid table is tiny (broadcast); corpus vectors are
    written bucketed by cell once, so a query batch shuffles nothing on the
    corpus side and scans ~n_probe/n_lists of the data (the partition-pruning
    analog for vector search). Deterministic for a fixed seed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = emb.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("_v")
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="_v", predictionCol="cell")
    model = km.fit(vecs.select("_v"))
    assigned = model.transform(vecs).select(id_col, vec_col, "cell")

    centroids = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = emb.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    )

    q = assigned.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # rank cells per query by centroid cosine; keep n_probe
    qc = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("csim", cosine_sim(F.col("qv"), F.col("centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cell"))
    probes = (
        qc.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
    )
    j = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )


def lsh_topk(
    emb: DataFrame,
    query_filter: Column,
    k: int = 3,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine rerank inside. At scale the bucket join replaces the full
    cross product with an equi-join (shuffle on bucket id, prunable)."""
    b = lsh_buckets(emb, n_planes, dims, id_col, vec_col)
    q = b.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("bucket")
    )
    c = b.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    j = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", "rn")
    )
