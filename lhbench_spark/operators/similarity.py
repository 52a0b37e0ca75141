"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

- Brute-force cosine top-k — the correctness baseline. Broadcast the
  (small) query set against the corpus; per-partition local top-k via
  window rank. Cost O(|corpus|·|queries|·dim) but embarrassingly
  parallel, no shuffle of the corpus.
- Bucketed ANN — random-hyperplane LSH signatures as the blocking key
  (the IVF analog without a trained codebook): candidates only within
  matching buckets, then exact cosine re-rank. Sub-linear candidate sets
  at the cost of recall; bucket count scales with corpus size.

All vector math is built-in higher-order functions (zip_with/aggregate) on
array<double> — JVM-side, no Python UDF. For very wide vectors a Pandas
UDF over Arrow batches becomes competitive; benchmark before switching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fixed random hyperplanes for the LSH tier (seed baked in, dim 64,
# 8 planes → 256 buckets). Values are ±1 (Rademacher) so the projection is
# a signed sum — cheap and dialect-portable.
LSH_PLANES = 8
_LCG_SEED = 1103515245


def _rademacher(plane: int, dim: int) -> list[int]:
    """Deterministic ±1 pattern per (plane, coordinate) via an LCG —
    reproducible across engines without RNG library differences."""
    out = []
    state = _LCG_SEED + 7919 * plane
    for _ in range(dim):
        state = (1103515245 * state + 12345) % (1 << 31)
        out.append(1 if (state >> 16) & 1 else -1)
    return out


def as_double(vec: str) -> Column:
    return F.expr(f"transform({vec}, x -> CAST(x AS DOUBLE))")


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rnk). The query side is
    broadcast; ranking is a window partitioned by query_id (bounded:
    |corpus| rows per query before the rank filter, pruned per-partition
    by Spark's WindowGroupLimit pushdown for rank < k filters)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine("_qv", "_cv").alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("_cos", 6).alias("cosine"),
            "rnk",
        )
    )


def lsh_bucket(vec_col: str, dim: int) -> Column:
    """Random-hyperplane signature (int in [0, 2^LSH_PLANES)) used as the
    ANN blocking key."""
    bits = []
    for p in range(LSH_PLANES):
        signs = _rademacher(p, dim)
        arr = "array(" + ", ".join(f"CAST({s} AS DOUBLE)" for s in signs) + ")"
        proj = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return F.expr("(" + " + ".join(bits) + ")")


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to the query's
    LSH bucket. Recall is tunable via LSH_PLANES (fewer planes → bigger
    buckets → higher recall and cost)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("_qv"),
        lsh_bucket(vec_col, dim).alias("_bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("_cv"),
        lsh_bucket(vec_col, dim).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine("_qv", "_cv").alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", F.round("_cos", 6).alias("cosine"), "rnk"
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) inside blocking
    buckets — the embedding analog of n-gram Jaccard dedup."""
    v = df.select(
        F.col(id_col).alias("_id"), F.col(block_col).alias("_blk"), as_double(vec_col).alias("_v")
    )
    left = v.select(F.col("_id").alias("vec_a"), F.col("_v").alias("_va"), "_blk")
    right = v.select(F.col("_id").alias("vec_b"), F.col("_v").alias("_vb"), "_blk")
    cos = cosine("_va", "_vb")
    return (
        left.join(right, "_blk")
        .filter((F.col("vec_a") < F.col("vec_b")) & (cos >= threshold))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
    )
