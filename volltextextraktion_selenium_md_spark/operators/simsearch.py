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
    """Sign bit of the weighted sum against one deterministic plane.

    The weights enter as ONE literal array + a left fold, not a
    dim-wide inline expression — an inline sum over 64 dims x many
    planes overflows janino's 64 KB codegen limit and drops the whole
    stage to interpreted mode. The fold accumulates left-to-right, the
    same order as the DuckDB oracle's `e[1]*w1 + e[2]*w2 + ...`."""
    weights = F.array(
        *[F.lit(float(hyperplane_weight(plane, d))) for d in range(dim)]
    )
    s = F.aggregate(
        F.zip_with(emb, weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (s > 0).cast("int")


def lsh_banded(
    embeddings: DataFrame, num_planes: int, dim: int, num_tables: int
) -> DataFrame:
    """Long-format multi-table signatures: (vec_id, tbl, bucket).

    OR-amplification: `num_tables` independent hash tables of
    `num_planes` sign bits each — a near neighbour missed by one table
    is caught by another (single-table recall on weakly-clustered data
    is poor; tests measure recall vs brute force). Table t uses the
    deterministic hyperplanes [t*num_planes, (t+1)*num_planes)."""
    rows = []
    for t in range(num_tables):
        sig = F.lit(0)
        for p in range(num_planes):
            sig = sig * 2 + _hyperplane_sign(
                F.col("embedding"), t * num_planes + p, dim
            )
        rows.append(
            embeddings.select(
                "*", F.lit(t).alias("tbl"), sig.alias("bucket")
            )
        )
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    num_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = any-table bucket collision with
    the query. At 100 TB: the banded table is O(N * L) small rows
    (vec_id + two ints), the join is equi on (tbl, bucket) — no
    quadratic stage anywhere."""
    base = with_norm(embeddings)
    banded = lsh_banded(base.select("vec_id", "embedding"), num_planes, dim, num_tables)
    q_banded = banded.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cand = (
        banded.join(F.broadcast(q_banded), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    joined = cand.join(F.broadcast(q), "query_id").join(base, "vec_id")
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
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 6,
    dim: int = 64,
    num_tables: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs (cos >= threshold), multi-table
    LSH-bucketed to avoid the quadratic self-join; exact cosine
    verifies candidates."""
    base = with_norm(embeddings)
    banded = lsh_banded(base.select("vec_id", "embedding"), num_planes, dim, num_tables)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["tbl", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .distinct()
    )
    xa = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
        F.col("norm").alias("n_a"),
    )
    xb = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
        F.col("norm").alias("n_b"),
    )
    cos = F.round(
        _dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b")), 4
    )
    return (
        cand.join(xa, "vec_a").join(xb, "vec_b")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
