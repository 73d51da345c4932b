"""Similarity search over embedding columns (``array<float>``).

- **brute_force_topk**: the exact baseline — broadcast the (small) query
  set against the corpus, fold the dot product JVM-side, rank with a
  window partitioned by query. One pass over the corpus, no shuffle of
  the corpus itself (the window shuffles only (query, candidate, score)
  tuples, which is |Q| x n rows; for large |Q| switch to the bucketed
  variant).
- **axis_lsh_topk**: the scale path — deterministic sign-bucket LSH
  (axis-aligned hyperplanes on fixed dimensions). Corpus and queries are
  bucketed by the same signature; the join is an equi-join on bucket, so
  candidate generation is O(bucket size), not O(n). Axis-aligned planes
  keep the operator reproducible across engines (no RNG state) while
  remaining a legitimate random-hyperplane family for normalized data.
- **cosine_near_duplicates**: blocked pair generation (block key, e.g. a
  coarse cluster/label/LSH bucket) + exact cosine filter.

All dot products fold sequentially in double precision (see
functions.vectors) so results are bit-reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import dot, norm
from ..partitioning import fan_out


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    Norms are precomputed map-side on each input (one ``sqrt(dot(v,v))``
    per VECTOR, not per pair), so the per-pair work after the broadcast
    join is a single fold — cosine values are bit-identical to the
    all-per-pair formulation since the norm expression is deterministic.
    The corpus side is fanned out first: a broadcast join inherits the
    probe side's partitioning, so an under-split corpus would otherwise
    serialize the whole scoring stage.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("query_norm"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("cand_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            dot(F.col("query_vec"), F.col("cand_vec"))
            / (F.col("query_norm") * F.col("cand_norm")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


def sign_bucket(vec_col, dims: tuple[int, ...] = (1, 8, 22, 43)) -> F.Column:
    """Deterministic LSH signature: sign bits at fixed (1-based) dims."""
    return F.concat(
        *[
            F.when(F.element_at(vec_col, d) >= 0, "1").otherwise("0")
            for d in dims
        ]
    )


def axis_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 8, 22, 43),
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket."""
    c = fan_out(corpus).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("cand_norm"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("query_norm"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            dot(F.col("query_vec"), F.col("cand_vec"))
            / (F.col("query_norm") * F.col("cand_norm")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine_sim", "rank")
    )


def cosine_near_duplicates(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs within blocks (cosine >= threshold).

    The self-join is keyed by the block column — at scale the block key
    should be an LSH bucket (see sign_bucket) or a coarse cluster id so
    block sizes stay bounded.

    Two scale guards: norms are precomputed per vector (map-side, before
    the pair blow-up), and the PAIR frame is fanned out before scoring —
    the join's output parallelism is bounded by the number of distinct
    blocks (10 labels ⇒ ≤10 busy tasks no matter the cluster size), so
    the cosine fold must be rebalanced onto all cores."""
    a = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        norm(F.col(vec_col)).alias("norm_a"),
    )
    b = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        norm(F.col(vec_col)).alias("norm_b"),
    )
    pairs = fan_out(a.join(b, "block").filter(F.col("id_a") < F.col("id_b")))
    return (
        pairs.withColumn(
            "cosine_sim",
            dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def l2_norms(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return df.select(F.col(id_col), norm(F.col(vec_col)).alias("l2_norm"))
