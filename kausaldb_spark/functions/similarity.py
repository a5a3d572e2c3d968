"""Similarity search over embedding columns (array<float>).

Two paths:
- ``dot_topk``: brute-force top-k by quantized integer dot product — the
  exactness baseline. Quantization (floor(x*1000 + 0.5) → bigint) makes the
  score integer-exact and therefore engine-portable (the float dot product
  is order-of-summation dependent; the int one is not). The query set is
  broadcast; the scan is a single pass over the corpus — at 100 TB this is
  the classic "broadcast the queries, never shuffle the corpus" shape.
- ``lsh_bucketed_topk``: sign-LSH (hyperplane = coordinate axes of the first
  ``n_bits`` dims) pre-bucket, probing only the query's bucket — the scale
  path trading recall for a corpus-partition-pruned scan. Buckets are
  computable per-row (no fitting), so the corpus can be *written* partitioned
  by bucket and the probe becomes partition pruning.
- ``cosine_topk``: float cosine via built-in array ops (zip_with/aggregate)
  for real use; not oracle-gated (float).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT_SCALE = 1000


def quantized(vec: Column) -> Column:
    """array<float> → array<bigint>, floor(x*scale + 0.5) (identical rounding
    in every engine, unlike round() whose half-rule differs)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * QUANT_SCALE + F.lit(0.5)).cast("bigint")
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def float_cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    def norm(v):
        return F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
        )
    return dot / (norm(a) * norm(b))


def dot_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by quantized dot product for each query id.
    Output: (query_id, neighbor_id, rank, dot) — all integers.
    Ties break by neighbor id (deterministic)."""
    q = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), quantized(F.col(vec_col)).alias("qv"))
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", int_dot(F.col("qv"), F.col("cv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "dot")
    )


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Sign-LSH bucket from the first n_bits coordinates (>=0 → 1)."""
    bucket = None
    for j in range(n_bits):
        bit = F.when(F.element_at(vec, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.
    Same output schema as dot_topk. Queries whose bucket holds < k neighbors
    return fewer rows (recall tradeoff, by design)."""
    with_bucket = embeddings.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), n_bits).alias("bucket")
    )
    q = (
        with_bucket.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), quantized(F.col(vec_col)).alias("qv"), "bucket")
    )
    corpus = with_bucket.select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col)).alias("cv"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(corpus, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", int_dot(F.col("qv"), F.col("cv")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "dot")
    )


def ivf_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 5,
    n_clusters: int = 16, n_probe: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: k-means-partition the corpus, probe only
    the ``n_probe`` centroids nearest each query. The second scale path next
    to sign-LSH: learned partitions follow the data distribution, so probes
    prune better on clustered corpora (at cluster scale the corpus is
    *written* partitioned by centroid id and a probe is partition pruning).

    Scoring matches dot_topk (quantized integer dot products), so recall is
    directly measurable against the exact baseline. Requires pyspark.ml
    (guarded import — returns the brute-force result if MLlib is absent).
    """
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector, vector_to_array
    except ImportError:  # pragma: no cover - mllib always ships with pyspark
        return dot_topk(embeddings, query_ids, k, id_col, vec_col)

    feats = embeddings.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(feats)
    assigned = model.transform(feats).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("centroid")
    )

    # centroid table is tiny: rank each query's centroids by distance driver-side
    centers = [c.tolist() for c in model.clusterCenters()]
    q_rows = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col))
        .collect()
    )
    probe_pairs = []
    for r in q_rows:
        v = list(r[vec_col])
        dists = sorted(
            range(len(centers)),
            key=lambda c: sum((float(a) - b) ** 2 for a, b in zip(v, centers[c])),
        )
        for c in dists[:n_probe]:
            probe_pairs.append((r["query_id"], c))
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(probe_pairs, "query_id long, centroid int")

    q = (
        embeddings.where(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), quantized(F.col(vec_col)).alias("qv"))
        .join(probes, "query_id")
    )
    corpus = assigned.select(
        F.col(id_col).alias("neighbor_id"), quantized(F.col(vec_col)).alias("cv"), "centroid"
    )
    scored = (
        F.broadcast(q)
        .join(corpus, "centroid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", int_dot(F.col("qv"), F.col("cv")).alias("dot"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "dot")
    )


def embedding_near_duplicates(
    embeddings: DataFrame, min_dot: int, n_bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-similarity near-dup pairs: sign-LSH bucketing, then exact
    quantized dot >= min_dot within each bucket. Output (id_a, id_b, dot).

    Shape: ONE shuffle (by bucket). The degenerate-bucket guard
    (``max_bucket_size``, default dedup.MAX_LSH_BUCKET — e.g. thousands of
    zero vectors landing in one sign bucket) is a window count over that
    same shuffle: WindowExec buffers per-group with disk spill, so an
    oversized bucket is filtered out *before* ``collect_list`` ever
    materializes it, keeping every in-memory pair array ≤ cap rows. Pair
    generation is then a per-bucket array self-product (higher-order
    transform, JVM-side) — the r2 formulation (separate count pass +
    bucket-filter join + bucket self-join) cost two extra jobs that
    dominated wall-clock at small corpus sizes and an extra full shuffle at
    large ones."""
    from kausaldb_spark.functions.dedup import MAX_LSH_BUCKET

    if max_bucket_size is None:
        max_bucket_size = MAX_LSH_BUCKET
    with_bucket = embeddings.select(
        F.col(id_col).alias("id"), quantized(F.col(vec_col)).alias("qv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    wn = Window.partitionBy("bucket")
    capped = (
        with_bucket.withColumn("_n", F.count("*").over(wn))
        .where(F.col("_n") <= max_bucket_size)
    )
    grouped = capped.groupBy("bucket").agg(
        F.collect_list(F.struct("id", "qv")).alias("xs")
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "xs",
                    lambda x, i: F.transform(
                        F.slice(F.col("xs"), i + F.lit(2), F.size(F.col("xs"))),
                        lambda y: F.struct(
                            x["id"].alias("ia"),
                            y["id"].alias("ib"),
                            int_dot(x["qv"], y["qv"]).alias("dot"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select(
            F.least("p.ia", "p.ib").alias("id_a"),
            F.greatest("p.ia", "p.ib").alias("id_b"),
            F.col("p.dot").alias("dot"),
        )
        .where(F.col("dot") >= min_dot)
    )
