"""Count-min sketch: bounded-memory frequency estimation.

The complement to the exact heavy-hitter report (profile.skew_report)
and the HLL distinct counts (profile.profile_columns): at 100 TB the
full per-key count table may itself be too large to keep, but a CMS is
``depth x width`` integer counters regardless of key cardinality, and —
because bucket counts add — the per-partition partial aggregate Spark
already does IS the sketch merge. Estimates only ever overestimate
(by at most the collision mass in the lightest row), never under.

Determinism contract: bucket = md5 over ``"<row>|<key>"`` (the repo's
one hashing spelling, functions.hashing.md5_bucket), so a DuckDB oracle
rebuilds the exact same sketch cell-for-cell and the estimate columns
hash-match — no probabilistic envelope needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket


def _cms_bucket(key_col: str, width: int):
    return md5_bucket(
        F.concat(F.col("row_idx").cast("string"), F.lit("|"), F.col(key_col)),
        width,
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Build the sketch: ``(row_idx, bucket, cnt)`` with ``depth*width``
    cells. One shuffle keyed (row_idx, bucket); the map-side partial
    aggregate bounds every task's state at ``depth*width`` counters, so
    the explode-by-depth never materializes ``depth x corpus`` rows
    anywhere."""
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row_idx")
    return (
        df.select(F.col(key_col), rows)
        .groupBy("row_idx", _cms_bucket(key_col, width).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Estimated count per key in ``keys_df``: min over the sketch rows
    of the probed cells (absent cell = 0). The sketch is broadcast —
    ``depth*width`` rows — so the probe side never shuffles."""
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row_idx")
    probes = keys_df.select(F.col(key_col), rows).withColumn(
        "bucket", _cms_bucket(key_col, width)
    )
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def _bloom_bit(key_col: str, n_bits: int):
    return md5_bucket(
        F.concat(F.col("hash_idx").cast("string"), F.lit("|"), F.col(key_col)),
        n_bits,
    )


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 1 << 20, n_hashes: int = 3
) -> DataFrame:
    """Bloom filter as a DataFrame of set bit positions ``(bit,)`` —
    at most ``n_bits`` rows regardless of key cardinality, built with
    one distinct-aggregate shuffle. Union of two filters = union of
    their bit frames; that associativity is what lets partial aggregates
    build it distributed."""
    hashes = F.explode(
        F.array(*[F.lit(j) for j in range(n_hashes)])
    ).alias("hash_idx")
    return (
        df.select(F.col(key_col), hashes)
        .select(_bloom_bit(key_col, n_bits).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """``(key, bloom_hit)`` per probed key: hit iff ALL ``n_hashes``
    positions are set. The bit frame is broadcast (bounded by
    ``n_bits``), so the probe side — the corpus — never shuffles for
    membership: the exact shape a 100 TB decontamination pass needs
    (possible false positives, never false negatives; survivors of the
    bloom gate go to the exact verify join, mirroring the LSH->Jaccard
    two-stage dedup design)."""
    hashes = F.explode(
        F.array(*[F.lit(j) for j in range(n_hashes)])
    ).alias("hash_idx")
    probes = keys_df.select(F.col(key_col), hashes).withColumn(
        "bit", _bloom_bit(key_col, n_bits)
    )
    marked = probes.join(
        F.broadcast(bits.withColumn("present", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(key_col).agg(
        (F.min(F.coalesce(F.col("present"), F.lit(0))) == 1).alias("bloom_hit")
    )
