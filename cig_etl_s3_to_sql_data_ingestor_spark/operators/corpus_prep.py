"""Training-data preparation operators: the corpus-shaping passes an LLM
data pipeline runs between raw ingestion and tokenization — benchmark
contamination checks, document chunking, sequence packing, stratified
sampling, weighted source interleaving, and PII/denylist redaction.

The reference engine stops at SQL-table ingestion (main.py:148-179 runs
extract -> transform -> bulk insert); these operators extend the same
ingestion surface to the corpus-preparation stages a 100 TB training
pipeline needs. Every shape here is Spark-native and scale-first:

- contamination is an inverted-index SEMI-join keyed by shingle with the
  (bounded) benchmark vocabulary broadcast — the corpus never shuffles;
- chunking/redaction are pure projections (explode + slice / regexp) that
  stay inside whole-stage codegen;
- packing is a window cumsum partitioned by the group key, so the only
  serial dependency is within a group, never across the corpus;
- interleaving computes the global mix position ARITHMETICALLY from
  per-source row numbers (cycle-major order) instead of a global
  row_number window, which would serialize the corpus onto one task;
- sampling is hash-bucketed (engine/partitioning-reproducible), never
  RNG-based.

All hashing is md5-based so a single-threaded SQL oracle reproduces every
value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..partitioning import fan_out
from .dedup import ngram_shingles_col, tokens_col


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document benchmark-contamination score: the fraction of the
    document's distinct word n-gram shingles that occur anywhere in the
    benchmark corpus (train/test leakage detection).

    The benchmark vocabulary (distinct shingles over the benchmark set) is
    small relative to the training corpus — a benchmark is thousands of
    documents, the corpus is billions — so it is broadcast and the
    candidate side is probed with a SEMI join: one pass over the corpus,
    no corpus shuffle, and the per-doc aggregate is partial (map-side
    combined). Returns (id, n_shingles, n_overlap, overlap_frac).
    """
    base = fan_out(docs).select(
        F.col(id_col),
        ngram_shingles_col(text_col, shingle_n).alias("shingles"),
    )
    vocab = (
        benchmark.select(
            F.explode(ngram_shingles_col(text_col, shingle_n)).alias("shingle")
        )
        .distinct()
    )
    hits = (
        base.select(F.col(id_col), F.size("shingles").alias("n_shingles"),
                    F.explode("shingles").alias("shingle"))
        .join(F.broadcast(vocab), "shingle", "left_semi")
        .groupBy(id_col, "n_shingles")
        .agg(F.count("*").alias("n_overlap"))
    )
    return hits.select(
        F.col(id_col),
        F.col("n_shingles"),
        F.col("n_overlap"),
        (F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")).alias(
            "overlap_frac"
        ),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into token-window chunks of ``chunk_size``
    tokens advancing by ``chunk_size - overlap`` (context-window prep for
    embedding/training jobs).

    Chunk starts are ``1, 1+stride, ...`` up to ``max(n - overlap, 1)`` so
    the final window always covers the tail and a short document yields
    exactly one chunk. Pure projection (split -> sequence -> posexplode ->
    slice): no shuffle, stays in codegen, and the chunk content is carried
    as an md5 so downstream exchanges ship 32 bytes instead of the text.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = fan_out(docs).select(
        F.col(id_col), tokens_col(text_col).alias("tokens")
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("tokens") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    chunk = F.slice(F.col("tokens"), F.col("chunk_start"), chunk_size)
    return toks.select(
        F.col(id_col),
        F.col("tokens"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    ).select(
        F.col(id_col),
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous-fill sequence packing: within each group (deterministic
    ``id_col`` order) documents are laid end-to-end and cut into bins of
    ``budget`` tokens — ``bin = floor(tokens_before_doc / budget)``.

    Packing is inherently order-dependent, so the serial dependency is
    confined to a window PARTITIONED BY the group key: groups pack in
    parallel, and at 100 TB the group key (source/shard) bounds each
    task's window state. Returns one row per (group, bin) with document
    and token counts — the shape a batch assembler consumes.
    """
    toks = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    w = (
        W.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    binned = toks.withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(budget)
        ),
    )
    return binned.groupBy(group_col, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def shard_pack_assignments(
    chunks: DataFrame,
    n_shards: int = 16,
    budget: int = 256,
    id_col: str = "doc_id",
    tokens_col_name: str = "n_chunk_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
) -> DataFrame:
    """Deterministic training-shard + pack-bin assignment for chunk rows
    — the metadata a batch assembler consumes and the unit the terminal
    shard writer (plans.corpus_pipeline.write_training_shards) commits.

    ``shard_id`` is the md5 hash bucket of ``id_col`` (every chunk of a
    document co-shards — sequence packing must never straddle a shard
    boundary mid-document), and ``bin_id`` is contiguous-fill packing
    WITHIN the shard: ``floor(prior_shard_tokens / budget)`` over the
    deterministic ``order_cols`` order — :func:`pack_sequences`' rule
    with the shard as the group. Assignment depends only on values,
    never on partitioning, engine, or rerun — which is what makes an
    exactly-once, resumable shard write possible at all (a re-run must
    regenerate byte-identical shard membership to skip committed
    shards).

    Scale: one window partitioned by ``shard_id`` — the serial
    dependency packing inherently has, confined to 1/n_shards of the
    corpus per task; no global window, no shuffle beyond the shard
    hash partitioning the write wants anyway.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("long")
        % n_shards
    )
    w = (
        W.partitionBy("shard_id")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn("shard_id", shard)
        .withColumn(
            "bin_id",
            F.floor(
                F.coalesce(F.sum(tokens_col_name).over(w), F.lit(0))
                / F.lit(budget)
            ).cast("long"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata: list[str],
    mod: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-bucket sample (~1/mod) with per-stratum
    accounting: membership is ``md5-bucket(id) % mod == 0`` — reproducible
    on any engine and any partitioning, unlike RNG ``sample()`` — and the
    result reports achieved vs nominal rate per stratum, which is the
    audit a dataset-mixture owner actually reads.

    One partial-aggregating pass; no shuffle beyond the stratum groupBy.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("long")
        % mod
    )
    return (
        docs.select(*strata, (bucket == 0).cast("int").alias("in_sample"))
        .groupBy(*strata)
        .agg(
            F.count("*").alias("n_total"),
            F.sum("in_sample").alias("n_sampled"),
        )
        .withColumn(
            "sample_rate",
            F.col("n_sampled").cast("double") / F.col("n_total").cast("double"),
        )
    )


def interleave_sources(
    docs: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted deterministic round-robin mix of sources: each cycle emits
    ``weight(s)`` documents from every source ``s``, so the long-run blend
    converges to the weight ratios — the dataset-mixture schedule used to
    oversample high-quality sources.

    The global position is computed ARITHMETICALLY:
    ``pos = cycle * K + offset(source) + rn % weight`` where ``rn`` is the
    0-based per-source row number, ``cycle = rn div weight``, ``K`` is the
    sum of all weights and ``offset`` the prefix sum of weights in sorted
    source order. A naive global ``row_number`` window would serialize the
    corpus onto one task; this keeps the only window partitioned by source
    and the mix position a pure projection. When a source exhausts, its
    later slots stay empty — the schedule keeps gaps rather than
    re-balancing, so positions never depend on other sources' sizes.

    Sources absent from ``weights`` are dropped (an explicit mixture is
    the contract; silently defaulting would alias their slot ranges).
    """
    names = sorted(weights)
    k = sum(weights.values())
    w_expr, off_expr = F.lit(None).cast("int"), F.lit(None).cast("long")
    acc = 0
    for s in names:
        w_expr = F.when(F.col(source_col) == s, F.lit(weights[s])).otherwise(w_expr)
        off_expr = F.when(F.col(source_col) == s, F.lit(acc)).otherwise(off_expr)
        acc += weights[s]
    rn = F.row_number().over(W.partitionBy(source_col).orderBy(id_col)) - 1
    d = docs.filter(F.col(source_col).isin(names)).select(
        F.col(source_col),
        F.col(id_col),
        w_expr.alias("w"),
        off_expr.alias("off"),
        rn.alias("rn"),
    )
    return d.select(
        source_col,
        id_col,
        (
            F.floor(F.col("rn") / F.col("w")) * F.lit(k)
            + F.col("off")
            + (F.col("rn") % F.col("w"))
        ).cast("long").alias("mix_pos"),
    )


# Conservative, RE2-and-Java-identical patterns: no backreferences, no
# lookaround, explicit character classes only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
}


def redact_patterns(
    docs: DataFrame,
    patterns: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact every match of each named pattern with ``[NAME]`` and count
    matches per pattern — the PII-scrub + audit pass.

    Pure projection (regexp_extract_all + chained regexp_replace), fully
    inside codegen; the scrubbed text is carried as an md5 so the audit
    result is tiny regardless of document size. Patterns must be
    RE2-compatible (no backreferences/lookaround) so the same regex means
    the same thing in Spark (Java) and the SQL oracle (RE2).
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    out = fan_out(docs).select(F.col(id_col), F.col(text_col).alias("_t"))
    counts = []
    red = F.col("_t")
    for name, pat in pats.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return out.select(
        F.col(id_col), *counts, F.md5(red).alias("redacted_hash")
    )


def mixture_plan(
    docs: DataFrame,
    target_weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixture planning: given target mixture ``target_weights``
    (source -> relative weight) and a training ``token_budget``, compute
    each source's current token share and the per-source sampling rate
    that realizes the target blend — the planning step behind
    domain-reweighting schemes (fixed-mixture sampling, DoReMi-style
    reweighting with externally supplied weights).

    ``sampling_rate = min(1, target_share * budget / available_tokens)``;
    a rate pinned at 1.0 means the source cannot fill its slot (the
    budget shortfall shows up in ``expected_tokens``). ONE partial-agg
    pass over the corpus (|sources| groups); the grand total is an
    unpartitioned window over the per-source frame, which is safe for
    the same reason as rolling_daily_revenue — its input is the bounded
    aggregate (one row per source), never the corpus. Sources absent
    from ``target_weights`` are excluded — same explicit-mixture
    contract as :func:`interleave_sources`.
    """
    names = sorted(target_weights)
    wsum = float(sum(target_weights.values()))
    share_expr = F.lit(None).cast("double")
    for s in names:
        share_expr = F.when(
            F.col(source_col) == s, F.lit(target_weights[s] / wsum)
        ).otherwise(share_expr)
    per = (
        docs.filter(F.col(source_col).isin(names))
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens_col(text_col))).alias("n_tokens"),
        )
    )
    total = F.sum("n_tokens").over(W.partitionBy())
    rate = F.least(
        F.lit(1.0),
        share_expr * F.lit(float(token_budget)) / F.col("n_tokens").cast("double"),
    )
    return (
        per.withColumn("_total", total)
        .select(
            F.col(source_col),
            F.col("n_docs"),
            F.col("n_tokens"),
            (F.col("n_tokens").cast("double") / F.col("_total").cast("double")).alias(
                "current_share"
            ),
            share_expr.alias("target_share"),
            rate.alias("sampling_rate"),
            F.floor(rate * F.col("n_tokens").cast("double")).cast("long").alias(
                "expected_tokens"
            ),
        )
        .orderBy(source_col)
    )


def budget_select(
    doc_stats: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget selection: rank docs by quality (score DESC,
    id ASC) and keep the prefix whose cumulative token count stays within
    ``budget`` — "take the best docs until the training budget is full".

    A naive global running sum is an unpartitioned window = every row on
    one task. Instead, the classic distributed prefix sum: range-partition
    by the rank order, accumulate locally per partition, collect the tiny
    per-partition totals (one row per partition — metadata, not data) to
    compute offsets, then broadcast the offsets back. Each doc's
    cumulative value = local running sum + its partition's offset, and
    since the cumulative token count of a doc is a sum over a fixed SET of
    better-ranked docs (integer addition, order-independent), the result
    is partitioning-invariant and oracle-exact.
    """
    from .dedup import _persist

    spark = doc_stats.sparkSession
    # Null weights cannot participate in a token budget (a null running
    # sum would poison every later row's cumulative value and the
    # driver-side offsets); unscorable docs are excluded up front.
    doc_stats = doc_stats.filter(F.col(weight_col).isNotNull())
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranked = doc_stats.repartitionByRange(
        n_parts, F.col(score_col).desc(), F.col(id_col)
    ).withColumn("_pid", F.spark_partition_id())
    local_w = (
        W.partitionBy("_pid")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # Persisted: the totals collect below executes the full upstream
    # lineage (scan + score + range shuffle + window), and the returned
    # frame would otherwise recompute all of it. Released by
    # operators.dedup.unpersist_all() like every other cached stage.
    local = _persist(ranked.withColumn("_local_cum", F.sum(weight_col).over(local_w)))
    # One row per partition: (pid, partition_total) — driver-side prefix.
    totals = {
        r["_pid"]: r["_t"]
        for r in local.groupBy("_pid").agg(F.max("_local_cum").alias("_t")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off = spark.createDataFrame(offsets, "_pid int, _offset bigint")
    return (
        local.join(F.broadcast(off), "_pid")
        .withColumn("cum_" + weight_col, F.col("_local_cum") + F.col("_offset"))
        .filter(F.col("cum_" + weight_col) <= budget)
        .drop("_pid", "_local_cum", "_offset")
    )


# Efraimidis–Spirakis key quantization: NANO-units (1e9), finer than
# the BM25 micro-nat convention because the key ln(u)/w carries a
# 1/weight factor — at weight ~1e3 a micro-unit floor collapses the
# top of the key distribution onto a handful of integers and the
# id tie-break (not the weights) would decide the sample. ln of an
# engine-identical double, floor-quantized so the comparison key is
# an integer on both engines; |ln(u)| <= ln(16^6+1) ~ 16.6, so the
# key magnitude is bounded by 1.7e10/w — comfortably int64.
ES_QUANT = 1_000_000_000
# DSIR log-ratio quantization keeps the package-wide micro-nat scale.
DSIR_QUANT = 1_000_000
_ES_HASH_SPACE = 16**6  # md5 first-6-hex-digit decode, [0, 16^6)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Weighted sample WITHOUT replacement: the ``k`` rows with the
    largest Efraimidis–Spirakis keys ``u_i^(1/w_i)`` (equivalently
    ``ln(u_i)/w_i`` — monotone transform), where ``u_i`` is a
    deterministic uniform derived from md5(id). Items are drawn with
    probability proportional to ``weight_col`` (the classic A-ES
    one-pass weighted reservoir scheme, Efraimidis & Spirakis 2006),
    but with NO RNG: a rerun, a different engine, or a different
    partitioning reproduces the exact same sample — the property every
    other sampling operator in this module pins.

    Exactness: ``u = (h6 + 1) / (16^6 + 1)`` is a ratio of two exact
    integers (identical double on any engine); the key is
    ``floor(ln(u) * ES_QUANT / w)`` — floor-quantized NANO-units
    (ES_QUANT = 1e9; see the module comment: a micro floor would
    collapse the top keys at weight ~1e3 and let the id tie-break
    decide the sample) with the id as tie-break, the same
    quantized-ln discipline as BM25's idf.
    Rows with NULL or non-positive weight cannot be weighted and are
    excluded up front (ln(u)/w flips sign at w<0 and divides by zero
    at w=0 — silence here would be a wrong sample, not an error).

    Scale: one scan + TakeOrdered(k) — no window, no shuffle of the
    corpus; the only data movement is each partition's local top-k
    (the reference's sampling surface is driver-side pandas,
    extract_data_from_parquet.py:21-38 loads whole files — this keeps
    selection distributed and the result tiny).
    """
    h6 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10
    ).cast("long")
    u = (h6 + F.lit(1)).cast("double") / F.lit(float(_ES_HASH_SPACE + 1))
    key_q = F.floor(
        F.log(u) * F.lit(float(ES_QUANT)) / F.col(weight_col).cast("double")
    ).cast("long")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep],
            # Reported in the column's OWN type: a long cast would
            # truncate fractional weights (quality scores in (0,1)) to
            # zero while the key correctly used the exact double.
            F.col(weight_col).alias("weight"),
            key_q.alias("key_q"),
        )
        .orderBy(F.col("key_q").desc(), F.col(id_col))
        .limit(k)
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    importance weights: per-document log-likelihood ratio of a hashed
    unigram bag-of-words model of the TARGET distribution (rows where
    ``target`` is true) against the full-corpus SOURCE distribution.
    Documents that look like the target domain score high; the weights
    feed :func:`weighted_sample` / top-k selection to build an
    in-domain training subset from a general corpus.

    Tokens hash into ``n_buckets`` md5 buckets (DSIR's hashed n-gram
    features — the model size is fixed at ``n_buckets`` regardless of
    corpus vocabulary). Per-bucket add-one-smoothed log-ratio
    ``ln(((c_T+1)·(N_S+B)) / ((c_S+1)·(N_T+B)))`` is floor-quantized
    to integer micro-nats (BM25_QUANT discipline; the ratio is built
    from int64 counts cast to double with a pinned op order, so both
    engines see identical ln inputs), and the per-doc weight is the
    integer SUM of its tokens' quantized ratios — order-independent,
    partitioning-invariant. One final double division yields the
    human-facing ``weight`` in nats.

    Scale: two token scans. Scan 1 aggregates (bucket → target/source
    counts): map-side combine collapses each partition to ≤``n_buckets``
    partials, so the shuffle is O(buckets × partitions), not corpus
    tokens. The λ table (``n_buckets`` rows) broadcasts; scan 2
    explodes tokens, joins λ broadcast (map-side), and the only
    corpus-sized shuffle is the per-doc partial-sum groupBy. No
    persisted corpus-sized intermediate — at 100 TB two scans beat
    caching an exploded token frame.
    """
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        target.alias("_is_target"),
        tokens_col(text_col).alias("_toks"),
    )
    exploded = toks.select(
        id_col,
        *keep,
        "_is_target",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.explode("_toks").alias("_t"),
    )
    bucketed = exploded.withColumn(
        "_bkt",
        (F.conv(F.substring(F.md5(F.col("_t")), 1, 6), 16, 10).cast("long"))
        % n_buckets,
    )
    counts = bucketed.groupBy("_bkt").agg(
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0))
        .cast("long")
        .alias("_ct"),
        F.count("*").cast("long").alias("_cs"),
    )
    totals = counts.agg(
        F.sum("_ct").cast("long").alias("_nt"),
        F.sum("_cs").cast("long").alias("_ns"),
    )
    # Pinned op order: (a·b)/(c·d) in DOUBLE — int64 products would
    # overflow at corpus scale (1e13 tokens squared), doubles with a
    # fixed association are engine-identical.
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "_bkt",
        F.floor(
            F.log(
                (
                    (F.col("_ct") + F.lit(1)).cast("double")
                    * (F.col("_ns") + F.lit(n_buckets)).cast("double")
                )
                / (
                    (F.col("_cs") + F.lit(1)).cast("double")
                    * (F.col("_nt") + F.lit(n_buckets)).cast("double")
                )
            )
            * F.lit(float(DSIR_QUANT))
        )
        .cast("long")
        .alias("_lam_q"),
    )
    return (
        bucketed.join(F.broadcast(lam), "_bkt")
        .groupBy(id_col, *keep, "n_tokens")
        .agg(F.sum("_lam_q").cast("long").alias("weight_q"))
        .withColumn(
            "weight", F.col("weight_q").cast("double") / F.lit(float(DSIR_QUANT))
        )
    )


def nb_train(
    labeled: DataFrame,
    label_col: str = "label",
    n_buckets: int = 1024,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train a hashed-unigram Naive Bayes text classifier — the
    exactly-reproducible stand-in for the fastText-style quality/domain
    classifiers production pipelines train (CCNet-lineage): token
    buckets are md5 hashes (model size fixed at ``n_buckets`` per
    class, independent of vocabulary), per-(bucket, class) add-one
    log-likelihoods and class log-priors are floor-quantized to integer
    micro-nats, so training is exact counting + one quantization — any
    engine, any partitioning, any rerun produces the identical model.

    Returns ``(lam, priors)``: ``lam`` is the DENSE
    (bucket, label, lam_q) table — every (bucket in 0..B-1) x (seen
    label) pair, absent counts smoothed as zero — and ``priors`` is
    (label, prior_q) from document counts. Dense matters: a test token
    hashing to a bucket unseen in some class must contribute that
    class's zero-count penalty, not silently drop from the sum.

    Scale: one token scan aggregated map-side to <= B x |labels|
    partials; the dense fill is a driver-free sequence explode over
    the (tiny) label frame. Both outputs are broadcast-sized.
    """
    toks = labeled.select(
        F.col(label_col).alias("label"), tokens_col(text_col).alias("_toks")
    )
    if toks.isEmpty():
        # An empty training set would propagate ln(0/0) NaNs into every
        # prediction — fail at train time with the actual problem named.
        raise ValueError("nb_train: empty training set")
    exploded = toks.select("label", F.explode("_toks").alias("_t"))
    bucketed = exploded.select(
        "label",
        (F.conv(F.substring(F.md5(F.col("_t")), 1, 6), 16, 10).cast("long"))
        % n_buckets,
    ).toDF("label", "bkt")
    counts = bucketed.groupBy("label", "bkt").agg(
        F.count("*").cast("long").alias("c")
    )
    class_tot = counts.groupBy("label").agg(F.sum("c").cast("long").alias("n_c"))
    dense = (
        class_tot.select(
            "label",
            "n_c",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_buckets - 1))
            ).alias("bkt"),
        )
        .join(counts, ["label", "bkt"], "left")
        .select(
            "bkt",
            "label",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("n_c") + F.lit(n_buckets)).cast("double")
                )
                * F.lit(float(DSIR_QUANT))
            )
            .cast("long")
            .alias("lam_q"),
        )
    )
    docs_per_class = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    priors = docs_per_class.crossJoin(
        F.broadcast(
            labeled.agg(F.count("*").cast("long").alias("n_total"))
        )
    ).select(
        "label",
        F.floor(
            F.log(F.col("n_docs").cast("double") / F.col("n_total").cast("double"))
            * F.lit(float(DSIR_QUANT))
        )
        .cast("long")
        .alias("prior_q"),
    )
    return dense, priors


def nb_scores(
    df: DataFrame,
    lam: DataFrame,
    priors: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-(document, class) integer scores under an :func:`nb_train`
    model — the raw log-posterior table :func:`nb_predict` argmaxes and
    the calibration query bins (margins need BOTH class scores, which
    the argmax discards). Zero-token documents produce no rows (no
    token, no evidence — both engines drop them identically).

    Scale: one token scan; the dense model (B x |labels| rows) and the
    priors broadcast; the per-(doc, label) partial sums are the only
    shuffle. Returns (id, *keep, label=class, score_q).
    """
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in keep], tokens_col(text_col).alias("_toks")
    )
    bucketed = toks.select(
        id_col,
        *keep,
        F.explode("_toks").alias("_t"),
    ).select(
        id_col,
        *keep,
        (F.conv(F.substring(F.md5(F.col("_t")), 1, 6), 16, 10).cast("long"))
        % n_buckets,
    ).toDF(id_col, *keep, "bkt")
    return (
        bucketed.join(F.broadcast(lam), "bkt")
        .groupBy(id_col, *keep, "label")
        .agg(F.sum("lam_q").cast("long").alias("_tok_q"))
        .join(F.broadcast(priors), "label")
        .select(
            id_col,
            *keep,
            "label",
            (F.col("_tok_q") + F.col("prior_q")).cast("long").alias("score_q"),
        )
    )


def nb_predict(
    df: DataFrame,
    lam: DataFrame,
    priors: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Score documents under an :func:`nb_train` model and pick the
    argmax class. Scores are integer sums of quantized log terms
    (order-independent, engine-exact); ties break toward the GREATER
    label under Spark struct ordering — deterministic and mirrored by
    the oracle's window tie-break.

    Scale: :func:`nb_scores`' shape plus one bounded argmax aggregate.
    Returns (id, *keep, label=winner, score_q).
    """
    scored = nb_scores(
        df, lam, priors,
        n_buckets=n_buckets, id_col=id_col, text_col=text_col, keep=keep,
    )
    best = scored.groupBy(id_col, *keep).agg(
        F.max(F.struct(F.col("score_q"), F.col("label"))).alias("_w")
    )
    return best.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col("_w")["label"].alias("predicted"),
        F.col("_w")["score_q"].alias("score_q"),
    )
