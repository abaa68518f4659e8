"""Similarity search over embedding columns (BASELINE.json north star).

Two paths over `embeddings(vec_id, embedding: array<float>, label)`:

- `cosine_topk`: brute-force exact top-k. The query set is small and
  broadcast; the corpus streams through one narrow stage computing the
  dot product with `aggregate(zip_with(...))` (JVM-side, no Python).
  Ranking uses a per-query window over the (tiny) per-query candidate
  space. Exact, and the right baseline for recall measurement.

- `ivf_topk`: IVF-style approximate search. A deterministic set of
  centroid vectors partitions the corpus into `nlist` buckets
  (assignment = argmax cosine to centroid, one broadcast join); a query
  probes only its `nprobe` nearest buckets. At 100 TB this turns a full
  corpus scan per query into a ~nprobe/nlist fraction, and the bucket
  assignment is precomputable/persistable as a partition column.

All arithmetic is done in float64 after an explicit cast (float32
accumulation drifts across engines; double accumulation left-to-right
is bit-stable and matches the DuckDB oracle exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right float64 dot product (order-stable)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    `queries` must be small (it is broadcast); `corpus` is never
    shuffled — the only exchange is the per-query window over candidate
    rows, and AQE handles the skew if k << candidates.
    Excludes self-matches when query ids coincide with corpus ids.
    Deterministic: ties break by corpus id ascending.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
    )
    c = corpus.select(F.col(id_col), F.col(vec_col))
    scored = c.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF bucket assignment: nearest centroid by cosine (broadcast argmax)."""
    cent = centroids.select(F.col(centroid_id_col), F.col(vec_col).alias("__cvec"))
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        id_col,
        vec_col,
        centroid_id_col,
        cosine(F.col(vec_col), F.col("__cvec")).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col(centroid_id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, vec_col, F.col(centroid_id_col).alias("bucket"))
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's `nprobe` nearest buckets.

    At scale the bucketed corpus is persisted partitioned by `bucket`,
    so each query reads ~nprobe/nlist of the data (partition pruning).
    """
    bucketed = assign_buckets(corpus, centroids, id_col, vec_col)
    cent = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("__cvec"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    qc = q.crossJoin(F.broadcast(cent)).select(
        query_id_col,
        "__qvec",
        "centroid_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("__sim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__sim").desc(), F.col("centroid_id").asc())
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select(query_id_col, "__qvec", F.col("centroid_id").alias("bucket"))
    )
    scored = bucketed.join(F.broadcast(probes), "bucket").where(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )
