"""Similarity search over the `embeddings` table (array<float> column).

- brute-force cosine top-k: the exact baseline. Dot products run
  JVM-side via zip_with + aggregate (double accumulation in array
  order, so DuckDB's list-based oracle sums identically).
- random-hyperplane LSH variant: the scale path. Signatures are
  deterministic (hyperplane signs derived from md5 of (plane, dim)),
  candidates share a signature bucket, top-k within bucket. At 100 TB
  the bucket join replaces the O(N*Q) cross join with O(N) bucketing +
  per-bucket joins.
- embedding-cosine near-dup pairs: all pairs above a cosine threshold,
  LSH-bucketed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def with_norm(embeddings: DataFrame) -> DataFrame:
    return embeddings.withColumn("norm", _norm(F.col("embedding")))


def cosine_topk_bruteforce(
    embeddings: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact top-k neighbours for each query id (excluding self).

    The query side is tiny -> broadcast; the corpus streams through one
    narrow stage + a per-query top-k window. Deterministic tiebreak:
    (cos desc, vec_id asc) with cos rounded to 4 dp so float noise
    cannot flip ranks between engines."""
    base = with_norm(embeddings)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        _dot(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def hyperplane_weight(plane: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane weight in [-1000, 1000]:
    md5 of 'p{plane}d{d}' -> first 8 hex digits -> mod 2001 - 1000.
    Computed once in Python (hashlib md5 == Spark md5 == DuckDB md5),
    emitted as literals into both engines."""
    import hashlib

    h = int(hashlib.md5(f"p{plane}d{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001) - 1000


def _hyperplane_sign(emb: Column, plane: int, dim: int) -> Column:
    """Sign bit of the weighted sum against one deterministic plane."""
    s = F.lit(0.0)
    for d in range(dim):
        s = s + F.element_at(emb, d + 1).cast("double") * F.lit(
            float(hyperplane_weight(plane, d))
        )
    return (s > 0).cast("int")


def lsh_signature(embeddings: DataFrame, num_planes: int = 8, dim: int = 64) -> DataFrame:
    """Bucket id = concatenated hyperplane sign bits (int in [0, 2^P))."""
    sig = F.lit(0)
    for p in range(num_planes):
        sig = sig * 2 + _hyperplane_sign(F.col("embedding"), p, dim)
    return embeddings.withColumn("bucket", sig)


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Recall measured against the brute-force baseline in tests."""
    base = lsh_signature(with_norm(embeddings), num_planes, dim)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    joined = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = F.round(
        _dot(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, num_planes: int = 6, dim: int = 64
) -> DataFrame:
    """Embedding near-dup pairs (cos >= threshold), LSH-bucketed to
    avoid the quadratic self-join; exact cosine verifies candidates."""
    base = lsh_signature(with_norm(embeddings), num_planes, dim)
    pairs = (
        base.alias("x")
        .join(base.alias("y"), ["bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
    )
    cos = F.round(
        _dot(F.col("x.embedding"), F.col("y.embedding"))
        / (F.col("x.norm") * F.col("y.norm")),
        4,
    )
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            "cos",
        )
        .distinct()
    )
