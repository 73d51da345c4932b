"""Corpus-management query surface: the sampling/splitting/stats ops a
training-data pipeline runs constantly, all engine-reproducible.

Random sampling is deliberately HASH-based, not RNG-based: Spark's
``sample()`` draws from a partition-seeded RNG that no other engine (or
even a different partitioning of the same data) reproduces. Hashing the
stable document id gives the same sample membership on any engine, any
partitioning, any day — which is what makes dataset splits auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import tokens_col

QUERIES = {}
ORACLES = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Split by md5 of the id: buckets 0-7 train, 8 val, 9 test. conv of the
# first 6 hex chars stays far below 2^31 — exact under ANSI too.
#
# The oracle decodes the hex digit-by-digit (strpos over the hex alphabet)
# instead of casting '0x…' to BIGINT: the string-literal hex cast is
# DuckDB-version-sensitive (r01 hash mismatch in the driver environment),
# while strpos + integer polynomial is identical everywhere.
_BUCKET = "CAST(conv(substr(md5(CAST(doc_id AS VARCHAR)), 1, 6), 16, 10) AS BIGINT) % 10"
from ..functions.hashing import sql_md5_mod as _sql_md5_mod

_SQL_BUCKET = _sql_md5_mod("CAST(doc_id AS VARCHAR)", 10)


def _bucket_col():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 10
    )


@register(
    "deterministic_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, n_chars,
             CASE WHEN {_SQL_BUCKET} < 8 THEN 'train'
                  WHEN {_SQL_BUCKET} = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM b GROUP BY split ORDER BY split
    """,
)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = _bucket_col()
    split = (
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


@register(
    "length_histogram",
    oracle="""
    SELECT CAST(n_chars // 50 AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY bucket ORDER BY bucket
    """,
)
def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing — the pre-pass for length-grouped batch
    packing; pure map + one aggregate."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.floor(F.col("n_chars") / 50).alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("bucket")
    )


# HLL sketch values are engine-specific (DuckDB's approx_count_distinct
# uses a different sketch), so raw estimates can never hash-match a
# cross-engine oracle. The hard signal instead: emit the EXACT distinct
# count (oracle-matchable) plus a deterministic boolean asserting the HLL
# estimate landed within the documented relative-error envelope — the
# sketch stays in the plan and its accuracy is value-checked every round.
# rsd=0.02 → the 0.05 envelope is 2.5σ; tests/test_sketches.py bounds the
# same error in-repo. At 100 TB the production form drops the exact
# column (fixed-size sketch state per group, no distinct-shuffle of the
# full key set); this validation form is what you run on a sample to
# qualify the sketch before trusting it at scale.
HLL_RSD = 0.02
HLL_REL_ERROR_ENVELOPE = 0.05  # 2.5 x rsd


@register(
    "approx_distinct_stats",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           COUNT(*) AS n_events,
           TRUE AS hll_within_rel_error
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", HLL_RSD).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * HLL_REL_ERROR_ENVELOPE
        ).alias("hll_within_rel_error"),
    ).orderBy("event_type")


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY source, term),
    df AS (SELECT term, COUNT(DISTINCT source) AS df FROM tok GROUP BY term),
    nsrc AS (SELECT COUNT(DISTINCT source) AS n FROM tok),
    scored AS (
      SELECT tf.source, tf.term,
             CAST(tf.tf AS DOUBLE) * (SELECT n FROM nsrc) / df.df AS score
      FROM tf JOIN df ON tf.term = df.term
    )
    SELECT source, term, score, rnk FROM (
      SELECT source, term, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 3 ORDER BY source, rnk
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top terms by a log-free tf-idf (tf x N / df): integer
    counts and one double division keep scores bit-identical across
    engines (ln() would differ by ULPs between libm implementations).
    Shuffles: one by (source, term) for tf, one by term for df. The df
    side is vocabulary-sized (unbounded at corpus scale), so it carries no
    broadcast hint — AQE broadcasts it while it fits and falls back to a
    shuffle join on a 100 TB vocabulary.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens_col("text")).alias("term"))
    tf = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("source").alias("df"))
    n_src = tok.select(F.countDistinct("source").alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "score", F.col("tf").cast("double") * F.col("n") / F.col("df")
        )
    )
    w = W.partitionBy("source").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("source", "term", "score", "rnk")
        .orderBy("source", "rnk")
    )


# Rank-error envelope for approx quantiles, mirroring the HLL envelope
# trick in approx_distinct_stats: the output carries exact, engine
# -reproducible anchors (the value at index floor((n-1)*q) of the sorted
# group) plus a deterministic boolean asserting Spark's Greenwald-Khanna
# sketch met its documented rank-error contract (<= n/accuracy). The
# approximate estimate itself never reaches the output, so merge-order
# nondeterminism in the sketch cannot flip a hash.
QUANTILE_ACCURACY = 1000
QUANTILE_LEVELS = (0.25, 0.5, 0.75, 0.9)


@register(
    "approx_quantile_envelope",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS q)
    SELECT r.l_returnflag, qs.q,
           r.l_extendedprice AS exact_value,
           CAST(r.n AS BIGINT) AS n,
           TRUE AS approx_within_rank_error
    FROM ranked r JOIN qs
      ON r.rn - 1 = CAST(FLOOR((r.n - 1) * qs.q) AS BIGINT)
    ORDER BY r.l_returnflag, qs.q
    """,
)
def approx_quantile_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag price quantiles: exact index-picked anchors plus a
    proof that ``percentile_approx`` stayed inside its rank-error bound.

    The exact anchor is the value at sorted index floor((n-1)*q) — a
    keyed window, integer index pick, no interpolation, so both engines
    select the identical double. The envelope check ranks Spark's GK
    estimate by counting rows strictly-below / at-or-below it (one
    conditional aggregate against the broadcast 12-row estimate frame)
    and asserts the rank interval intersects [q*n - n/acc - 1,
    q*n + n/acc + 1]. At 100 TB the sketch (one pass, bounded memory,
    mergeable partials) is the production path and the exact anchor is
    the audit; here both run so the contract is machine-checked.
    """
    from pyspark.sql import Window as W

    acc = QUANTILE_ACCURACY
    qlits = F.array(*[F.lit(q) for q in QUANTILE_LEVELS])
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )

    from ..operators.dedup import _persist

    est = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", list(QUANTILE_LEVELS), acc
            ).alias("ests"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "n",
            F.posexplode("ests").alias("pos", "est"),
        )
        .select(
            "l_returnflag",
            "n",
            F.element_at(qlits, F.col("pos") + 1).alias("q"),
            "est",
        )
    )
    # Three downstream branches (rank counts, exact index picks, the
    # envelope check) consume this 12-row frame — persist it so the
    # lineitem scan + GK sketch build runs once, not three times.
    est = _persist(est)

    # Rank the estimate exactly: rows strictly below / at-or-below it.
    ranks = (
        li.join(
            F.broadcast(est.select("l_returnflag", "q", "est")), "l_returnflag"
        )
        .groupBy("l_returnflag", "q")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("est"), 1).otherwise(0)
            ).alias("n_lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("est"), 1).otherwise(0)
            ).alias("n_le"),
        )
    )

    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.withColumn("rn", F.row_number().over(w))
    exact = (
        ranked.join(
            F.broadcast(
                est.select("l_returnflag", "n", "q").distinct()
            ),
            "l_returnflag",
        )
        .filter(
            F.col("rn") - 1
            == F.floor((F.col("n") - 1) * F.col("q")).cast("bigint")
        )
        .select(
            "l_returnflag",
            "q",
            F.col("l_extendedprice").alias("exact_value"),
            "n",
        )
    )

    lo = F.col("q") * F.col("n") - F.col("n") / acc - 1
    hi = F.col("q") * F.col("n") + F.col("n") / acc + 1
    checked = (
        ranks.join(
            est.select("l_returnflag", "q", "n").distinct(),
            ["l_returnflag", "q"],
        )
        .select(
            "l_returnflag",
            "q",
            ((F.col("n_lt") + 1 <= hi) & (F.col("n_le") >= lo)).alias(
                "approx_within_rank_error"
            ),
        )
    )
    return (
        exact.join(checked, ["l_returnflag", "q"])
        .select(
            "l_returnflag", "q", "exact_value", "n", "approx_within_rank_error"
        )
        .orderBy("l_returnflag", "q")
    )


@register(
    "priority_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS STRING)), doc_id
             ) AS pri_rank
      FROM documents
    )
    SELECT source, doc_id, CAST(pri_rank AS BIGINT) AS pri_rank
    FROM pri WHERE pri_rank <= 20 ORDER BY source, pri_rank
    """,
)
def priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group 'reservoir': the k docs per source with
    the LOWEST md5(id) — a uniform-ish fixed-size sample that any
    engine, any partitioning, and any later rerun reproduces exactly
    (the distributed analog of reservoir sampling, without its
    scan-order dependence). The hash is the priority, the id breaks the
    (never-occurring) hash tie, and the per-group window is keyed — at
    100 TB this is one shuffle of (group, id, hash) triples and each
    group retains k rows, which is how you build audit samples and
    eval slices from a corpus without an RNG seed that nothing else
    can replay.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("pri_rank", F.row_number().over(w))
        .filter(F.col("pri_rank") <= 20)
        .select("source", "doc_id", "pri_rank")
        .orderBy("source", "pri_rank")
    )
