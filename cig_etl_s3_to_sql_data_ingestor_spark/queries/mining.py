"""Corpus-mining query surface: cross-source contamination/overlap
analytics, n-gram diversity, normalization fingerprints, boilerplate
detection, and vocabulary (Zipf) statistics over the ``documents`` table.

These extend the dedup/corpus-prep operators with the *measurement*
queries a training-data curation pipeline runs before deciding what to
keep: how much sources overlap, how repetitive each source is, which
prefixes are boilerplate, and what the token distribution looks like.

Engine-parity rules as everywhere else (NOTES.md): md5-only hashing,
integer counts with one final double division, DuckDB ``list_*``
mirrors of the Spark ``token_kgrams_col`` doubling chain, and total
-order tie-breaks under every window/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import ngram_shingles_col, token_kgrams_col, tokens_col

QUERIES = {}
ORACLES = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# DuckDB mirrors of the shared Spark token/shingle helpers (identical to
# the proven dedup-oracle spellings).
_SQL_TOK = r"regexp_split_to_array(lower(trim(text)), '\s+')"
_SQL_SHINGLES3 = (
    "list_distinct(list_transform("
    "  generate_series(0, greatest(len(tokens) - 3, 0)),"
    "  i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' ')))"
)


def _sql_kgrams(k: int) -> str:
    """Full (non-padded) k-grams: empty list when the doc has < k tokens
    — the SQL mirror of ``token_kgrams_col``'s exact-length semantics."""
    if k == 1:
        return "tokens"
    return (
        f"CASE WHEN len(tokens) >= {k} THEN list_transform("
        f"  generate_series(0, len(tokens) - {k}),"
        f"  i -> array_to_string(list_slice(tokens, i + 1, i + {k}), ' '))"
        f" ELSE [] END"
    )


# ---------------------------------------------------------------------------
# Cross-source overlap: pairwise shingle-set Jaccard between sources —
# the "how much does source A duplicate source B" matrix that decides
# cross-source dedup ordering. Sources are a BOUNDED key set (thousands
# at crawl scale), so the whole computation folds into ONE shuffle over
# the exploded (source, shingle) rows: groupBy(shingle) +
# collect_set(source) builds the deduped inverted index, from which the
# per-source set sizes (explode + count), the stop-shingle cap
# (size(keys) <= cap), and the pair intersections (in-row sorted-array
# combinations — pure codegen, never a self-join or all-pairs of
# documents) all derive without rescanning the corpus. A UNIVERSAL
# shingle (boilerplate shared by every source) would still fan out
# |sources|² pair rows; ``max_shingle_df`` drops such shingles from the
# intersection index (per-source set sizes still count them, so the
# reported Jaccard is exact when no shingle exceeds the cap and a
# conservative underestimate otherwise), and the dropped count rides
# the job as an observed metric, logged at WARNING when non-zero by a
# bounded 24h watcher (see source_overlap's docstring for the window
# caveat) — the cap is additionally always visible structurally, in
# both the plan and the oracle.
# ---------------------------------------------------------------------------


def source_overlap(
    d: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairwise n-gram-shingle Jaccard between values of ``source_col``
    — the source-keyed instantiation of the SAME capped-Jaccard
    semantics as the doc-keyed dedup verifier (pinned value-identical by
    ``tests/test_dedup_ops.py::test_jaccard_strategies_and_callers_agree``),
    via the GROUPED strategy: sources are a bounded key set, so one
    ``groupBy(shingle).collect_set(source)`` shuffle replaces the r4/r5
    distinct + df-aggregate + anti-join + self-join lineage. The
    stop-shingle cap becomes a ``size(keys) <= cap`` filter, and the
    dropped-shingle count rides the SAME job as an observed metric
    (``df.observe`` — no extra pass, no cache dependence at 100 TB),
    logged at WARNING when non-zero by a watcher thread as soon as the
    returned frame's first action completes. Bounded-window caveat: the
    watcher polls for 24h and then exits (so a never-materialized frame
    cannot leak a blocked thread); a frame whose FIRST action lands
    later than that logs nothing — the cap itself remains structurally
    visible in the plan and the oracle regardless."""
    import logging
    import threading

    from pyspark.sql import Observation

    from ..operators.dedup import jaccard_pairs_from_grouped, key_item_sets_grouped

    ss = d.select(
        F.col(source_col).alias("source"),
        F.explode(ngram_shingles_col(text_col, n)).alias("shingle"),
    )
    grouped = key_item_sets_grouped(ss, "source", "shingle")
    if max_shingle_df is not None:
        obs = Observation()
        grouped = grouped.observe(
            obs,
            F.sum(
                F.when(F.size("keys") > max_shingle_df, 1).otherwise(0)
            ).alias("n_hot"),
        )

        def _log_cap(cap: int = max_shingle_df) -> None:
            # Classic sessions: poll the non-blocking JVM accessor so a
            # frame that is built but never materialized (plan audits,
            # discarded branches) cannot leak a permanently-blocked
            # thread — the watcher gives up after 24h (a frame whose
            # FIRST action lands later than that logs nothing; see the
            # docstring's bounded-window caveat). Where those internals
            # don't exist (Spark Connect's Observation has no _jo, and
            # py4j answers hasattr-style probes for ANY name, so only an
            # actual call proves the private method exists), fall back
            # to the blocking get — contract kept, with the
            # never-materialized thread leak as the documented price.
            import time

            from py4j.protocol import Py4JError

            jo = getattr(obs, "_jo", None)
            n_hot = None
            if jo is not None:
                try:
                    # Probe call: py4j returns a JavaMember for any
                    # attribute name, so hasattr() is always True — the
                    # first real invocation is the existence check.
                    jrow = jo.getRowOrEmpty()
                except Py4JError:
                    jo = None  # Spark build without the private method
                else:
                    deadline = time.monotonic() + 24 * 3600.0
                    start = time.monotonic()
                    try:
                        while True:
                            if jrow is not None and jrow.isDefined():
                                n_hot = jrow.get().getLong(0)
                                break
                            now = time.monotonic()
                            if now >= deadline:
                                return
                            # 0.2s keeps the common case (first action
                            # lands within seconds) prompt; after the
                            # first minute back off to 5s so a
                            # long-idle frame costs the JVM 0.2
                            # polls/s, not 5/s.
                            time.sleep(0.2 if now - start < 60.0 else 5.0)
                            jrow = jo.getRowOrEmpty()
                    except Py4JError:  # session torn down mid-poll
                        return
            if jo is None:
                try:
                    n_hot = obs.get["n_hot"]  # blocking fallback
                except Exception:  # session torn down while blocked
                    return
            if n_hot:
                logging.getLogger(__name__).warning(
                    "source_overlap: dropped %d shingles with "
                    "source-df > %d from the intersection index "
                    "(reported Jaccard is a conservative "
                    "underestimate for pairs sharing them)",
                    n_hot,
                    cap,
                )

        threading.Thread(
            target=_log_cap, daemon=True, name="source-overlap-cap-log"
        ).start()
    return (
        jaccard_pairs_from_grouped(grouped, max_item_df=max_shingle_df)
        .select(
            F.col("key_a").alias("source_a"),
            F.col("key_b").alias("source_b"),
            F.col("n_a"),
            F.col("n_b"),
            F.col("shared").alias("n_common"),
            "jaccard",
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "cross_source_overlap",
    oracle=f"""
    WITH tok AS (SELECT source, {_SQL_TOK} AS tokens FROM documents),
    sh AS (SELECT source, {_SQL_SHINGLES3} AS shingles FROM tok),
    ss AS (
      SELECT DISTINCT source, unnest(shingles) AS shingle FROM sh
    ),
    sizes AS (SELECT source, COUNT(*) AS n_shingles FROM ss GROUP BY source),
    hot AS (SELECT shingle FROM ss GROUP BY shingle HAVING COUNT(*) > 5),
    idx AS (SELECT * FROM ss ANTI JOIN hot USING (shingle)),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_common
      FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n_shingles AS BIGINT) AS n_a,
           CAST(sb.n_shingles AS BIGINT) AS n_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY i.source_a, i.source_b
    """,
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 3-gram-shingle Jaccard between document sources, with
    the df > 5 stop-shingle cap applied (and mirrored in the oracle) so
    the hot-key guard is itself driver-verified."""
    d = load_table(spark, sf_dir, "documents")
    return source_overlap(d, max_shingle_df=5)




# ---------------------------------------------------------------------------
# N-gram diversity (type-token ratio) per source for n in {1,2,3} — the
# self-repetition profile (RefinedWeb/Gopher-style) that flags sources
# whose text is template spam. One exploded frame per n, unioned, then a
# single (source, n) aggregation with count + count-distinct; everything
# stays keyed by (source, n-gram) — no global state.
# ---------------------------------------------------------------------------


@register(
    "ngram_diversity",
    oracle=f"""
    WITH tok AS (SELECT source, {_SQL_TOK} AS tokens FROM documents),
    grams AS (
      SELECT source, 1 AS n, unnest({_sql_kgrams(1)}) AS gram FROM tok
      UNION ALL
      SELECT source, 2 AS n, unnest({_sql_kgrams(2)}) AS gram FROM tok
      UNION ALL
      SELECT source, 3 AS n, unnest({_sql_kgrams(3)}) AS gram FROM tok
    )
    SELECT source, CAST(n AS INTEGER) AS n,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
           CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*) AS ttr
    FROM grams
    GROUP BY source, n
    ORDER BY source, n
    """,
)
def ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct/total n-gram ratio per (source, n) for n = 1, 2, 3."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", tokens_col("text").alias("toks")
    )
    d = d.withColumn("n_toks", F.size("toks"))

    def grams_for(n: int) -> DataFrame:
        if n == 1:
            g = F.col("toks")
        else:
            g = F.when(
                F.col("n_toks") >= n,
                token_kgrams_col(F.col("toks"), F.col("n_toks"), n),
            ).otherwise(F.array().cast("array<string>"))
        return d.select(
            "source", F.lit(n).alias("n"), F.explode(g).alias("gram")
        )

    grams = grams_for(1).unionByName(grams_for(2)).unionByName(grams_for(3))
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count("*").alias("total_ngrams"),
            F.countDistinct("gram").alias("distinct_ngrams"),
        )
        .select(
            "source",
            "n",
            "total_ngrams",
            "distinct_ngrams",
            (
                F.col("distinct_ngrams").cast("double") / F.col("total_ngrams")
            ).alias("ttr"),
        )
        .orderBy("source", "n")
    )


# ---------------------------------------------------------------------------
# Normalization fingerprints: the canonical-text pass (trim, lowercase,
# collapse whitespace runs) every exact-dedup stage should run first, with
# a deterministic md5 fingerprint of the normalized form. Pure codegen
# projection — zero shuffles; the fingerprint doubles as the join key for
# normalized exact dedup downstream.
# ---------------------------------------------------------------------------


@register(
    "text_normalize_stats",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, source, text,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text
      FROM documents
    )
    SELECT doc_id, source,
           CAST(length(text) AS BIGINT) AS orig_len,
           CAST(length(norm_text) AS BIGINT) AS norm_len,
           CAST(len(regexp_split_to_array(norm_text, ' ')) AS BIGINT)
             AS n_tokens,
           md5(norm_text) AS norm_fingerprint
    FROM norm
    ORDER BY doc_id
    """,
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-collapsed lowercase canonicalization + md5 fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.select(
            "doc_id",
            "source",
            F.length("text").cast("long").alias("orig_len"),
            norm.alias("norm_text"),
        )
        .select(
            "doc_id",
            "source",
            "orig_len",
            F.length("norm_text").cast("long").alias("norm_len"),
            F.size(F.split(F.col("norm_text"), " ")).cast("long").alias("n_tokens"),
            F.md5(F.col("norm_text")).alias("norm_fingerprint"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Boilerplate prefixes: groups of documents sharing their first-k tokens —
# the crawl-pipeline signal for shared headers/templates that whole-doc
# exact dedup misses when bodies diverge. Hash-keyed group-by on the
# prefix digest (one shuffle); the HAVING > 1 filter runs post-partial-agg.
# ---------------------------------------------------------------------------


@register(
    "boilerplate_prefix_groups",
    oracle=f"""
    WITH tok AS (SELECT doc_id, source, {_SQL_TOK} AS tokens FROM documents),
    pre AS (
      SELECT doc_id, source,
             array_to_string(list_slice(tokens, 1, 4), ' ') AS prefix
      FROM tok
    )
    SELECT md5(prefix) AS prefix_hash, prefix,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM pre
    GROUP BY prefix
    HAVING COUNT(*) > 1
    ORDER BY n_docs DESC, prefix
    """,
)
def boilerplate_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents sharing their first-4-token prefix (template detection)."""
    d = load_table(spark, sf_dir, "documents")
    pre = d.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice(tokens_col("text"), 1, 4)).alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            F.md5("prefix").alias("prefix_hash"),
            "prefix",
            "n_docs",
            "n_sources",
            "first_doc",
            "last_doc",
        )
        .orderBy(F.col("n_docs").desc(), "prefix")
    )


# ---------------------------------------------------------------------------
# Vocabulary / Zipf statistics: corpus-wide top-25 tokens with rank and
# cumulative frequency share. The top-k is taken with a distributed
# orderBy().limit() (TakeOrdered — no global window over the vocabulary);
# rank and the running share are then computed on the 25 surviving rows,
# where an unpartitioned window is bounded by construction. Integer
# counts with one final double division keep the shares bit-stable.
# ---------------------------------------------------------------------------


@register(
    "vocab_stats",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOK}) AS token FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
    total AS (SELECT SUM(freq) AS n_total FROM counts),
    top AS (
      SELECT token, freq FROM counts ORDER BY freq DESC, token LIMIT 25
    )
    SELECT t.token, CAST(t.freq AS BIGINT) AS freq,
           CAST(ROW_NUMBER() OVER (ORDER BY t.freq DESC, t.token) AS BIGINT)
             AS rank,
           CAST(t.freq AS DOUBLE) / tt.n_total AS share,
           CAST(SUM(t.freq) OVER (ORDER BY t.freq DESC, t.token
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / tt.n_total AS cum_share
    FROM top t, total tt
    ORDER BY rank
    """,
)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus tokens with rank, share, and cumulative share."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    total = counts.agg(F.sum("freq").alias("n_total"))
    top = counts.orderBy(F.col("freq").desc(), "token").limit(25)
    w = W.orderBy(F.col("freq").desc(), "token")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "freq",
            F.row_number().over(w).cast("long").alias("rank"),
            (F.col("freq").cast("double") / F.col("n_total")).alias("share"),
            (
                F.sum("freq")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .cast("double")
                / F.col("n_total")
            ).alias("cum_share"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Per-source quality funnel — the batch analog of the streaming quality
# monitor: doc counts, exact-decimal mean quality, below-floor fraction,
# mean length per source. The per-doc score is the same deterministic
# double as quality_score; aggregation casts it to DECIMAL(18,9) so the
# mean is order-independent at any parallelism (functions/exact.py rule).
# One keyed shuffle on source with map-side partial aggregation.
# ---------------------------------------------------------------------------


def _funnel_oracle() -> str:
    from .text import _EN, SQL_TOKENS  # same proven stopword/token SQL

    return f"""
    WITH s AS (
      SELECT doc_id, source, length(text) AS n_chars,
             len({SQL_TOKENS}) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             {_EN} AS stop_hits
      FROM documents
    ), q AS (
      SELECT source, n_chars,
             least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
               + least(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 4,
                       1.0) * 0.4
               + (1 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
                            * 10, 1.0)) * 0.2
               AS score
      FROM s
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
             AS mean_quality,
           CAST(COUNT(*) FILTER (WHERE score < 0.5) AS DOUBLE) / COUNT(*)
             AS frac_below_floor,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM q
    GROUP BY source
    ORDER BY source
    """


@register("source_quality_funnel", oracle=_funnel_oracle())
def source_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-health summary from the quality heuristics."""
    from ..operators.text import quality_scores

    d = load_table(spark, sf_dir, "documents")
    q = quality_scores(d, keep=("source",))
    return (
        q.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(F.col("quality_score").cast("decimal(18,9)")).cast("double")
                / F.count("*")
            ).alias("mean_quality"),
            (
                F.count(F.when(F.col("quality_score") < 0.5, 1)).cast("double")
                / F.count("*")
            ).alias("frac_below_floor"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BPE subword induction (operators/bpe.py): the tokenizer-construction
# step of a training-data pipeline, with the full greedy merge loop
# mirrored in unrolled DuckDB CTEs — the same deterministic algorithm in
# three independent implementations (Python trainer, in-plan DataFrame
# loop, SQL oracle). Merge application is leftmost non-overlapping
# replacement of " L R " in a space-padded symbol string, which Spark's,
# DuckDB's and Python's literal `replace` all share; ties break on the
# ascending pair string.
# ---------------------------------------------------------------------------

_BPE_STEPS = 8


def _sql_bpe_ctes(n_steps: int) -> str:
    """w0/s0 + (p_k, b_k, s_k, r_k) per unrolled greedy step: pair
    counts, 1-row argmax, merge application, step report."""
    ctes = [
        f"w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        f"  SELECT unnest({_SQL_TOK}) AS word FROM documents) GROUP BY word)",
        "s0 AS (SELECT word, n,"
        " ' ' || array_to_string(list_transform("
        "   generate_series(1, length(word)), i -> substring(word, i, 1)), ' ')"
        " || ' ' AS syms FROM w0)",
    ]
    for k in range(1, n_steps + 1):
        prev = f"s{k - 1}"
        ctes += [
            f"""p{k} AS (
      SELECT pair, SUM(n) AS merge_count FROM (
        SELECT n, unnest(CASE WHEN len(tk) >= 2 THEN list_transform(
            generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i + 1])
          ELSE [] END) AS pair
        FROM (SELECT n, string_split(trim(syms), ' ') AS tk FROM {prev})
      ) GROUP BY pair)""",
            f"""b{k} AS (SELECT pair, merge_count FROM p{k}
      ORDER BY merge_count DESC, pair LIMIT 1)""",
            f"""s{k} AS (
      SELECT w.word, w.n,
             replace(w.syms, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS syms
      FROM {prev} w CROSS JOIN b{k} b)""",
            f"""r{k} AS (
      SELECT CAST({k} AS INTEGER) AS step,
             split_part(b.pair, ' ', 1) AS left_sym,
             split_part(b.pair, ' ', 2) AS right_sym,
             CAST(b.merge_count AS BIGINT) AS merge_count,
             (SELECT CAST(SUM(n * len(string_split(trim(syms), ' '))) AS BIGINT)
              FROM s{k}) AS corpus_tokens_after
      FROM b{k} b)""",
        ]
    return ",\n    ".join(ctes)


@register(
    "bpe_merge_steps",
    oracle=f"""
    WITH {_sql_bpe_ctes(_BPE_STEPS)}
    SELECT * FROM ({" UNION ALL ".join(f"SELECT * FROM r{k}" for k in range(1, _BPE_STEPS + 1))})
    ORDER BY step
    """,
)
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 greedy BPE merges learned from the corpus, with each
    step's merged-pair frequency and the corpus token count after it.

    Scale shape (operators/bpe.py): the only corpus-scale pass is the
    word-count shuffle; every merge step then runs on the vocabulary
    -bounded symbol frame (pair explode + partial agg + 1-row TakeOrdered
    argmax broadcast back), with lineage cut per step."""
    from ..operators.bpe import bpe_merge_steps_df, word_counts

    d = load_table(spark, sf_dir, "documents")
    return bpe_merge_steps_df(spark, word_counts(d), _BPE_STEPS)


@register(
    "bpe_corpus_compression",
    oracle=f"""
    WITH {_sql_bpe_ctes(_BPE_STEPS)},
    enc AS (
      SELECT word,
             CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_subwords
      FROM s{_BPE_STEPS}
    ),
    toks AS (
      SELECT source, unnest({_SQL_TOK}) AS word FROM documents
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.n_subwords) AS BIGINT) AS n_subwords,
           CAST(SUM(e.n_subwords) AS DOUBLE) / COUNT(*) AS subwords_per_word
    FROM toks t JOIN enc e ON t.word = e.word
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def bpe_corpus_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source subword/word ratio under the 8-merge BPE vocabulary —
    the compression accounting that tells a pipeline how many training
    tokens each source will actually produce.

    The encoded vocabulary (word -> subword count) comes straight from
    the training plan's final symbol frame and is broadcast onto the
    exploded corpus tokens: the corpus-scale path is one explode + one
    broadcast join + one partial agg, zero Python."""
    from ..operators.bpe import bpe_train_plan, word_counts

    d = load_table(spark, sf_dir, "documents")
    _, encoded = bpe_train_plan(spark, word_counts(d), _BPE_STEPS)
    enc = encoded.select(
        "word",
        F.size(F.split(F.trim(F.col("syms")), " ")).cast("bigint").alias(
            "n_subwords"
        ),
    )
    toks = d.select("source", F.explode(tokens_col("text")).alias("word"))
    return (
        toks.join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
            (
                F.sum("n_subwords").cast("double") / F.count(F.lit(1))
            ).alias("subwords_per_word"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (operators/sketches.py): the bounded-memory frequency
# structure for key spaces too large to count exactly. depth=3, width=16
# here — deliberately tiny so the fixture vocabulary collides and the
# one-sided error (estimate >= exact, never under) is visible in the
# overestimate column. The sketch is md5-deterministic, so the oracle
# rebuilds it cell-for-cell: exact values, no probabilistic envelope.
# ---------------------------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPK = 3, 16, 15


from ..functions.hashing import sql_md5_mod as _sql_md5_mod


_CMS_HASH_ARG = "CAST(row_idx AS VARCHAR) || '|' || word"


@register(
    "cms_word_frequency",
    oracle=f"""
    WITH toks AS (SELECT unnest({_SQL_TOK}) AS word FROM documents),
    js AS (SELECT unnest([{", ".join(str(j) for j in range(_CMS_DEPTH))}]) AS row_idx),
    cells AS (
      SELECT row_idx, {_sql_md5_mod(_CMS_HASH_ARG, _CMS_WIDTH)} AS bucket,
             COUNT(*) AS cnt
      FROM toks CROSS JOIN js GROUP BY 1, 2
    ),
    exact AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM toks GROUP BY word
    ),
    top AS (
      SELECT word, exact_count FROM exact
      ORDER BY exact_count DESC, word LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT t.word, t.exact_count, j.row_idx,
             {_sql_md5_mod(_CMS_HASH_ARG, _CMS_WIDTH)} AS bucket
      FROM top t CROSS JOIN js j
    ),
    est AS (
      SELECT word, exact_count,
             CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_estimate
      FROM probes p
      LEFT JOIN cells c ON p.row_idx = c.row_idx AND p.bucket = c.bucket
      GROUP BY word, exact_count
    )
    SELECT word, exact_count, cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est
    ORDER BY exact_count DESC, word
    """,
)
def cms_word_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimates vs exact counts for the corpus's top words.

    Build: one shuffle into depth x width counters (partial agg = sketch
    merge). Probe: broadcast the sketch onto the candidate keys. The
    overestimate column is the CMS's one-sided error, visible here
    because width=16 forces collisions."""
    from ..operators.sketches import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens_col("text")).alias("word"))
    sketch = cms_build(toks, "word", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.col("exact_count").desc(), F.col("word")).limit(
        _CMS_TOPK
    )
    est = cms_estimate(
        sketch, top.select("word"), "word", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    return (
        top.join(F.broadcast(est), "word")
        .select(
            "word",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), F.col("word"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination gate (operators/sketches.py): the
# n_bits=4096 / n_hashes=2 configuration is deliberately small so the fixture
# shows real false positives — the quantity a pipeline must route to an
# exact verify join. md5-deterministic, so the oracle rebuilds the
# filter bit-for-bit and the false-positive counts compare exactly.
# ---------------------------------------------------------------------------

_BLOOM_BITS, _BLOOM_HASHES = 4096, 2
_BLOOM_HASH_ARG = "CAST(hash_idx AS VARCHAR) || '|' || word"


@register(
    "bloom_decontamination",
    oracle=f"""
    WITH sh AS (
      SELECT source, {_SQL_SHINGLES3} AS shingles
      FROM (SELECT source, {_SQL_TOK} AS tokens FROM documents)
    ),
    toks AS (
      SELECT DISTINCT source, unnest(shingles) AS word FROM sh
    ),
    ev AS (SELECT DISTINCT word FROM toks WHERE source = 'src0'),
    js AS (SELECT unnest([{", ".join(str(j) for j in range(_BLOOM_HASHES))}]) AS hash_idx),
    bits AS (
      SELECT DISTINCT {_sql_md5_mod(_BLOOM_HASH_ARG, _BLOOM_BITS)} AS bit
      FROM ev CROSS JOIN js
    ),
    pw AS (SELECT DISTINCT word FROM toks WHERE source <> 'src0'),
    probes AS (
      SELECT word, {_sql_md5_mod(_BLOOM_HASH_ARG, _BLOOM_BITS)} AS bit
      FROM pw CROSS JOIN js
    ),
    hits AS (
      SELECT word,
             MIN(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS hit
      FROM probes p LEFT JOIN bits b ON p.bit = b.bit
      GROUP BY word
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(h.hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN m.word IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_members,
           CAST(SUM(CASE WHEN h.hit = 1 AND m.word IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives
    FROM toks t
    JOIN hits h ON t.word = h.word
    LEFT JOIN ev m ON t.word = m.word
    WHERE t.source <> 'src0'
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bloom-gate audit against the src0 shingle vocabulary:
    how many distinct 3-gram shingles hit the filter, how many are true
    members, and how many are false positives (the exact-verify
    workload of a decontamination pass).

    Scale shape: the filter is a bounded bit frame broadcast to the
    probe; the corpus side reduces to per-source DISTINCT words and
    never shuffles for membership."""
    from ..operators.sketches import bloom_build, bloom_probe

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(ngram_shingles_col("text", 3)).alias("word")
    ).distinct()
    ev = toks.filter(F.col("source") == "src0").select("word").distinct()
    bits = bloom_build(ev, "word", n_bits=_BLOOM_BITS, n_hashes=_BLOOM_HASHES)
    pw = toks.filter(F.col("source") != "src0").select("word").distinct()
    hits = bloom_probe(
        bits, pw, "word", n_bits=_BLOOM_BITS, n_hashes=_BLOOM_HASHES
    )
    member = ev.withColumn("is_member", F.lit(1))
    return (
        toks.filter(F.col("source") != "src0")
        .join(F.broadcast(hits), "word")
        .join(F.broadcast(member), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias(
                "n_bloom_hits"
            ),
            F.sum(
                F.when(F.col("is_member").isNotNull(), 1).otherwise(0)
            ).alias("n_true_members"),
            F.sum(
                F.when(
                    F.col("bloom_hit") & F.col("is_member").isNull(), 1
                ).otherwise(0)
            ).alias("n_false_positives"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence from the corpus unigram distribution — the
# "how far does this source's token mix drift from the blend" number a
# mixture-weighting pass consumes (domain-reweighting literature scores
# candidate sources exactly this way). Engine parity follows the char-LM
# precedent: each per-TERM log-ratio is quantized once with
# floor(ln(r) * 1000) at vocabulary granularity (each FACTOR is cast to
# double before multiplying — counts are < 2^53 so the casts are exact
# and the one product rounds identically in both engines, with no
# int64 overflow at corpus scale), then weighted by integer counts and
# summed as int64 — order-independent — with ONE double division at the
# end.
# ---------------------------------------------------------------------------

KL_QUANT = 1000  # milli-nats


@register(
    "source_token_divergence",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_SQL_TOK}) AS term FROM documents
    ),
    st AS (SELECT source, term, COUNT(*) AS c_st FROM tok GROUP BY source, term),
    src AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM st GROUP BY source),
    ct AS (SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY term),
    tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS t FROM st),
    contrib AS (
      SELECT st.source,
             st.c_st * CAST(FLOOR(LN(
               (CAST(st.c_st AS DOUBLE) * CAST(tot.t AS DOUBLE))
                 / (CAST(src.t_s AS DOUBLE) * CAST(ct.c_t AS DOUBLE))
             ) * {KL_QUANT}) AS BIGINT) AS kq
      FROM st
      JOIN src ON src.source = st.source
      JOIN ct ON ct.term = st.term
      CROSS JOIN tot
    )
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           src.t_s AS n_tokens,
           CAST(SUM(c.kq) AS BIGINT) AS kl_quantized,
           CAST(SUM(c.kq) AS DOUBLE) / (src.t_s * {KL_QUANT}) AS kl_nats
    FROM contrib c JOIN src ON src.source = c.source
    GROUP BY c.source, src.t_s ORDER BY c.source
    """,
)
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source || corpus) over unigram token distributions, in
    quantized milli-nats.

    Two shuffles build the (source, term) counts and the vocabulary
    -sized term marginals; the per-source totals and the scalar corpus
    total are tiny aggregates broadcast back. The vocabulary marginal
    carries no broadcast hint — AQE broadcasts it while it fits and
    falls back to a shuffle join on a 100 TB vocabulary, same policy as
    tfidf_top_terms. Every source's score folds integer contributions,
    so the result is identical under any partitioning (asserted by the
    parallelism-invariance suite's mechanism).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens_col("text")).alias("term"))
    st = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c_st"))
    src = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    ct = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    tot = st.agg(F.sum("c_st").alias("t"))
    contrib = (
        st.join(ct, "term")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "t_s",
            (
                F.col("c_st")
                * F.floor(
                    F.log(
                        (
                            F.col("c_st").cast("double")
                            * F.col("t").cast("double")
                        )
                        / (
                            F.col("t_s").cast("double")
                            * F.col("c_t").cast("double")
                        )
                    )
                    * KL_QUANT
                ).cast("bigint")
            ).alias("kq"),
        )
    )
    return (
        contrib.groupBy("source", "t_s")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("kq").alias("kl_quantized"),
        )
        .select(
            "source",
            "n_terms",
            F.col("t_s").alias("n_tokens"),
            "kl_quantized",
            (
                F.col("kl_quantized").cast("double")
                / (F.col("t_s") * F.lit(KL_QUANT))
            ).alias("kl_nats"),
        )
        .orderBy("source")
    )


# Fixed retrieval workload for the BM25 query: four keyword queries over
# the corpus vocabulary, shared verbatim by the Spark frame and the
# oracle's VALUES list so the two cannot drift.
BM25_QUERY_TERMS: tuple[tuple[int, str], ...] = (
    (0, "hash"),
    (0, "join"),
    (1, "window"),
    (1, "agg"),
    (1, "group"),
    (2, "vector"),
    (2, "scan"),
    (3, "slow"),
    (3, "customer"),
    (3, "merge"),
)

_SQL_BM25_VALUES = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERY_TERMS)


# ONE oracle spelling for the whole BM25 family: the direct query, and
# the incremental query (split -> build -> merge -> search), whose
# merge-equals-recompute contract means the FULL-corpus SQL is exactly
# its expected answer.
# The BM25 scoring chain as reusable CTE text: `_SQL_BM25_CTES` ends with
# every frame the final ranked select needs, `_SQL_BM25_RANKED(k)` is that
# select (rank <= k, no ORDER BY) — so composers (the RRF hybrid below)
# can hang fusion logic off `bm25rank` while the direct oracles keep the
# single spelling of every constant and tie-break.
_SQL_BM25_CTES = f"""qt AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term
      FROM (VALUES {_SQL_BM25_VALUES}) AS v(query_id, term)
    ),
tok AS (
      SELECT doc_id,
             CAST(len({_SQL_TOK}) AS BIGINT) AS dl,
             unnest({_SQL_TOK}) AS term
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({_SQL_TOK})) AS BIGINT) AS total_len
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
             MIN(dl) AS dl
      FROM tok WHERE term IN (SELECT DISTINCT term FROM qt)
      GROUP BY doc_id, term
    ),
    dfr AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    contrib AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(floor(
               CAST(CAST(floor(ln(CAST(2 * s.n_docs + 1 AS DOUBLE)
                                  / CAST(2 * d.df + 1 AS DOUBLE))
                               * 1000000) AS BIGINT) AS DOUBLE)
               * CAST(88 * tf.tf * s.total_len AS DOUBLE)
               / CAST(40 * s.total_len * tf.tf + 12 * s.total_len
                      + 36 * tf.dl * s.n_docs AS DOUBLE)
             ) AS BIGINT) AS contrib_q
      FROM tf
      JOIN dfr d USING (term)
      JOIN qt USING (term)
      CROSS JOIN stats s
    ),
    scores AS (
      SELECT query_id, doc_id, CAST(SUM(contrib_q) AS BIGINT) AS score_q
      FROM contrib GROUP BY query_id, doc_id
    )"""


def _sql_bm25_ranked(k: int = 10) -> str:
    return f"""SELECT query_id, doc_id, score_q,
           CAST(score_q AS DOUBLE) / 1000000 AS score, rank
    FROM (
      SELECT query_id, doc_id, score_q,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score_q DESC, doc_id)
                  AS BIGINT) AS rank
      FROM scores
    ) WHERE rank <= {k}"""


_SQL_BM25_ORACLE = f"""
    WITH {_SQL_BM25_CTES}
    {_sql_bm25_ranked(10)} ORDER BY query_id, rank
    """


@register("bm25_search", oracle=_SQL_BM25_ORACLE)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked keyword retrieval (top-10 docs per query) — the
    search/decontamination modality the curation surface lacked:
    tfidf_top_terms extracts per-doc terms, this RANKS documents for a
    query. Integer-exact scoring (quantized idf, exact-ratio tf
    normalization — see operators/text.bm25_topk) keeps the top-k
    hash-stable across engines."""
    from ..operators.text import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    return bm25_topk(d, terms, k=10).orderBy("query_id", "rank")


@register("bm25_incremental", oracle=_SQL_BM25_ORACLE)
def bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 index maintenance, proven by construction: the
    corpus splits into an 'existing' store (md5-bucket != 0, ~3/4) and
    a 'new crawl batch' (bucket 0), each builds its own index
    (operators/text.bm25_build_index), the two merge in O(batch) work
    (bm25_merge_index: postings union + integer df/stat sums), and the
    merged index is searched. The oracle scores the FULL corpus
    directly — so any deviation of merge-from-rebuild (double-counted
    df, lost postings, stat drift) fails the value hash."""
    from ..functions.hashing import md5_bucket
    from ..operators.text import (
        bm25_build_index,
        bm25_merge_index,
        bm25_search_indexed,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id"), 4)
    existing = d.filter(bucket != 0)
    batch = d.filter(bucket == 0)
    merged = bm25_merge_index(
        *bm25_build_index(existing), *bm25_build_index(batch)
    )
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    return bm25_search_indexed(*merged, terms, k=10).orderBy("query_id", "rank")


PMI_QUANT = 1_000_000  # micro-nat quantization for the PMI score
PMI_MIN_COUNT = 5  # collocation floor: rare bigrams have unstable PMI


@register(
    "collocation_pmi",
    oracle=f"""
    WITH tok AS (SELECT {_SQL_TOK} AS tokens FROM documents),
    uc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest({_sql_kgrams(1)}) AS w FROM tok) GROUP BY w
    ),
    bc AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12
      FROM (SELECT unnest({_sql_kgrams(2)}) AS bigram FROM tok)
      GROUP BY bigram
    ),
    tt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM uc),
    bt AS (SELECT CAST(SUM(c12) AS BIGINT) AS b FROM bc),
    j AS (
      SELECT bc.bigram, bc.c12, u1.c AS c1, u2.c AS c2, tt.t, bt.b
      FROM bc
      CROSS JOIN tt CROSS JOIN bt
      JOIN uc u1 ON string_split(bc.bigram, ' ')[1] = u1.w
      JOIN uc u2 ON string_split(bc.bigram, ' ')[2] = u2.w
      WHERE bc.c12 >= {PMI_MIN_COUNT}
    ),
    scored AS (
      SELECT bigram, c12, c1, c2,
             CAST(floor(ln(
               (CAST(c12 AS DOUBLE) * CAST(t AS DOUBLE) / CAST(b AS DOUBLE))
               * (CAST(t AS DOUBLE)
                  / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
             ) * {PMI_QUANT}) AS BIGINT) AS pmi_q
      FROM j
    )
    SELECT bigram, c12, c1, c2, pmi_q,
           CAST(pmi_q AS DOUBLE) / {PMI_QUANT} AS pmi_nats
    FROM scored ORDER BY pmi_q DESC, bigram LIMIT 25
    """,
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 token-bigram collocations by pointwise mutual information
    — the word-ASSOCIATION view the frequency queries (vocab_stats,
    ngram_diversity) don't give: which adjacent pairs co-occur more
    than their unigram frequencies predict. Integer counts throughout;
    PMI = ln((c12/B)/((c1/T)(c2/T))) evaluated as one fixed-order
    double expression over exact integer inputs (scale-safe: no
    integer product of counts, so no int64 ceiling) and floor-quantized
    to micro-nats; ties break on the bigram text. Scale shape: two
    corpus token shuffles (unigram + bigram counts), vocabulary-keyed
    equi-joins, TakeOrdered top-k — never a corpus self-join."""
    d = load_table(spark, sf_dir, "documents").select(
        tokens_col("text").alias("toks")
    )
    d = d.withColumn("n_toks", F.size("toks"))
    uni = (
        d.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    big = (
        d.select(
            F.explode(
                F.when(
                    F.col("n_toks") >= 2,
                    token_kgrams_col(F.col("toks"), F.col("n_toks"), 2),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("c12"))
    )
    tt = uni.agg(F.sum("c").cast("long").alias("t"))
    bt = big.agg(F.sum("c12").cast("long").alias("b"))
    parts = F.split(F.col("bigram"), " ")
    j = (
        big.filter(F.col("c12") >= PMI_MIN_COUNT)
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(bt))
    )
    pmi = F.log(
        (
            F.col("c12").cast("double")
            * F.col("t").cast("double")
            / F.col("b").cast("double")
        )
        * (
            F.col("t").cast("double")
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        )
    )
    scored = j.select(
        "bigram",
        "c12",
        "c1",
        "c2",
        F.floor(pmi * F.lit(PMI_QUANT)).cast("long").alias("pmi_q"),
    )
    return (
        scored.orderBy(F.col("pmi_q").desc(), "bigram")
        .limit(25)
        .select(
            "bigram",
            "c12",
            "c1",
            "c2",
            "pmi_q",
            (F.col("pmi_q").cast("double") / F.lit(PMI_QUANT)).alias("pmi_nats"),
        )
    )


# Fixed exact-phrase workload: four 2-token phrases plus one 3-token
# phrase (different lengths exercise the per-length k-gram paths).
# Shared verbatim by the Spark frame and the oracle's VALUES list.
PHRASE_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "hash join"),
    (1, "slow query"),
    (2, "table scan"),
    (3, "key value"),
    (4, "slow hash batch"),
)

_SQL_PHRASE_VALUES = ", ".join(f"({q}, '{p}')" for q, p in PHRASE_QUERIES)

# One oracle for both phrase paths: the indexed path is pinned
# row-identical to the direct one (same semantics, amortized build), so
# they share the SQL mirror verbatim.
_PHRASE_ORACLE = f"""
    WITH pq AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, phrase
      FROM (VALUES {_SQL_PHRASE_VALUES}) AS v(query_id, phrase)
    ),
    tok AS (SELECT doc_id, {_SQL_TOK} AS tokens FROM documents),
    grams AS (
      SELECT doc_id, unnest({_sql_kgrams(2)}) AS phrase FROM tok
      UNION ALL
      SELECT doc_id, unnest({_sql_kgrams(3)}) AS phrase FROM tok
    ),
    hits AS (
      SELECT g.doc_id, g.phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM grams g
      WHERE g.phrase IN (SELECT phrase FROM pq)
      GROUP BY g.doc_id, g.phrase
    )
    SELECT query_id, doc_id, n_occurrences, rank FROM (
      SELECT pq.query_id, h.doc_id, h.n_occurrences,
             CAST(ROW_NUMBER() OVER (PARTITION BY pq.query_id
                                     ORDER BY h.n_occurrences DESC,
                                              h.doc_id) AS BIGINT) AS rank
      FROM hits h JOIN pq ON h.phrase = pq.phrase
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """


@register("phrase_search", oracle=_PHRASE_ORACLE)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval: top-10 documents per phrase by exact
    adjacent-token occurrence count — the exact-match modality
    complementing bag-of-words BM25 (a doc scoring high on 'hash' AND
    'join' separately is not a 'hash join' hit). Phrases of length n
    are n-grams, so matching is the proven zip_with k-gram chain + a
    broadcast semi-join on the phrase set: one scan, shuffle bounded
    by phrase hits (never corpus size). Ties break on doc_id; the
    3-token phrase exercises the second k-gram length. Direct path
    (operators/text.phrase_topk) — pays the corpus scan per call; the
    ``phrase_search_indexed`` twin amortizes it."""
    from ..operators.text import phrase_topk

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pq = spark.createDataFrame(
        list(PHRASE_QUERIES), "query_id long, phrase string"
    )
    return phrase_topk(d, pq, k=10)


@register("phrase_search_indexed", oracle=_PHRASE_ORACLE)
def phrase_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval over the at-rest k-gram posting store
    (r6 verdict #5): build the 2-/3-gram postings once
    (operators/text.phrase_build_index — one corpus shuffle), search
    via broadcast semi-join against the postings — the corpus text is
    never touched at search time, the exact
    bm25_build_index/bm25_search_indexed pattern. Row-identical to the
    direct path (same oracle verbatim; also pinned head-to-head by
    tests/test_retrieval_semdedup.py). In-query the build obviously
    still runs; the bench twin ``phrase_search_from_index`` measures
    search-many over a PREBUILT store."""
    from ..operators.text import phrase_build_index, phrase_search_indexed as _psi

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pq = spark.createDataFrame(
        list(PHRASE_QUERIES), "query_id long, phrase string"
    )
    postings = phrase_build_index(d, lengths=(2, 3))
    # The build call IS this query, so its lengths are store-recorded
    # metadata here — pass them through instead of re-deriving.
    return _psi(postings, pq, k=10, stored_lengths=(2, 3))


# Hybrid retrieval: RRF fusion of the BM25 lexical list and the embedding
# ANN list — the production search-stack combiner (operators.text.rrf_fuse;
# Cormack et al. SIGIR'09). Query ids are shared between BM25_QUERY_TERMS
# and the embeddings table (vec_id == doc_id in the fixture, as a real
# hybrid deployment keys both indexes by the same document id). ANN side
# at k=20 so all three fusion branches (both-lists / bm25-only /
# ann-only) are populated at every test scale.
_RRF_K0 = 60
_RRF_ANN_K = 20


def _sql_rrf_hybrid() -> str:
    from .vectors import _sql_cosine

    return f"""
    WITH {_SQL_BM25_CTES},
    bm25rank AS ({_sql_bm25_ranked(10)}),
    qv AS (
      SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings
      WHERE vec_id IN (SELECT DISTINCT query_id FROM qt)
    ),
    annrank AS (
      SELECT query_id, cand_id, rank FROM (
        SELECT qv.query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY qv.query_id
                                  ORDER BY {_sql_cosine('qv.query_vec', 'c.embedding')} DESC,
                                           c.vec_id) AS rank
        FROM embeddings c CROSS JOIN qv WHERE c.vec_id <> qv.query_id
      ) WHERE rank <= {_RRF_ANN_K}
    ),
    fused AS (
      SELECT COALESCE(b.query_id, a.query_id) AS query_id,
             COALESCE(b.doc_id, a.cand_id) AS cand_id,
             b.rank AS rank_a, a.rank AS rank_b,
             COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K0} + b.rank), 0.0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K0} + a.rank), 0.0)
               AS rrf_score
      FROM bm25rank b FULL OUTER JOIN annrank a
        ON b.query_id = a.query_id AND b.doc_id = a.cand_id
    )
    SELECT query_id, cand_id, CAST(rank_a AS BIGINT) AS rank_a,
           CAST(rank_b AS BIGINT) AS rank_b, rrf_score,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, cand_id) AS rank
      FROM fused
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """


def _sql_rrf_hybrid_ivf() -> str:
    from .vectors import _sql_ivf_search, _sql_kmeans_ctes

    return f"""
    WITH {_SQL_BM25_CTES},
    bm25rank AS ({_sql_bm25_ranked(10)}),
    c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=4)},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings
          WHERE vec_id IN (SELECT DISTINCT query_id FROM qt)),
    {_sql_ivf_search(n_probe=12, k=_RRF_ANN_K, as_cte="annrank")},
    fused AS (
      SELECT COALESCE(b.query_id, a.query_id) AS query_id,
             COALESCE(b.doc_id, a.cand_id) AS cand_id,
             b.rank AS rank_a, a.rank AS rank_b,
             COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K0} + b.rank), 0.0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K0} + a.rank), 0.0)
               AS rrf_score
      FROM bm25rank b FULL OUTER JOIN annrank a
        ON b.query_id = a.query_id AND b.doc_id = a.cand_id
    )
    SELECT query_id, cand_id, CAST(rank_a AS BIGINT) AS rank_a,
           CAST(rank_b AS BIGINT) AS rank_b, rrf_score,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, cand_id) AS rank
      FROM fused
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """


@register("hybrid_rrf_search_ivf", oracle=_sql_rrf_hybrid_ivf())
def hybrid_rrf_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION hybrid shape end-to-end oracle-backed: the same
    RRF fusion as ``hybrid_rrf_search`` with the brute-force vector
    provider swapped for the deployed IVF index (16 trained cells, 12
    probes, the exact constants/tie-breaks of ``ann_ivf_topk`` so the
    oracle reuses the pinned kmeans + ivf-search CTE chains verbatim).
    Proves the docstring promise of the brute-force form — "at 100 TB
    the ANN side swaps to the IVF/PQ family (same contract)" — as a
    registered query rather than an assertion: provider swap changes
    ONLY the annrank CTE in both engines. The streaming-store twin is
    ``streaming.hybrid_search.hybrid_search_from_stores`` (bench:
    hybrid_search_stores)."""
    from ..operators.similarity import ivf_topk
    from ..operators.text import bm25_topk, rrf_fuse

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    qids = sorted({q for q, _ in BM25_QUERY_TERMS})
    queries = e.filter(F.col("vec_id").isin(qids))
    bm25 = bm25_topk(d, terms, k=10).select(
        "query_id", F.col("doc_id").alias("cand_id"), "rank"
    )
    ann = ivf_topk(
        e, queries, k=_RRF_ANN_K, n_cells=16, n_probe=12, kmeans_sample_mod=4
    ).select("query_id", "cand_id", "rank")
    return rrf_fuse(bm25, ann, k=10, k0=_RRF_K0).orderBy("query_id", "rank")


@register("hybrid_rrf_search", oracle=_sql_rrf_hybrid())
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval via reciprocal-rank fusion: BM25
    top-10 over the documents and brute-force-cosine top-20 over the
    aligned embeddings fuse as 1/(60+rank_a) + 1/(60+rank_b), missing
    lists contributing 0, final top-10 per query by (score DESC, id).
    Rank-based fusion needs no cross-modality score calibration — the
    reason RRF is the default hybrid combiner in production stacks.
    Both providers are the oracle-exact kernels (integer BM25 scoring,
    fold-exact cosine), the fused score is a fixed-order two-term IEEE
    sum of exact-integer reciprocals, and symmetric-rank ties break on
    the candidate id — hash-stable across engines. At 100 TB the ANN
    side swaps to the IVF/PQ family (same (query_id, cand_id, rank)
    contract) and the BM25 side to the bucketed streaming store; the
    fusion join stays |Q| x (k_a + k_b) regardless."""
    from ..operators.text import bm25_topk, rrf_fuse

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    qids = sorted({q for q, _ in BM25_QUERY_TERMS})
    queries = e.filter(F.col("vec_id").isin(qids))
    from ..operators.similarity import brute_force_topk

    bm25 = bm25_topk(d, terms, k=10).select(
        "query_id", F.col("doc_id").alias("cand_id"), "rank"
    )
    ann = brute_force_topk(e, queries, k=_RRF_ANN_K).select(
        "query_id", "cand_id", "rank"
    )
    return rrf_fuse(bm25, ann, k=10, k0=_RRF_K0).orderBy("query_id", "rank")
