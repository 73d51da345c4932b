"""End-to-end corpus preparation: the composed pipeline a training-data
team runs between "raw documents landed" and "chunks ready to tokenize".

Stages (each one an operator that is also independently oracle-checked
through its ``queries()`` entry):

1. **exact dedup** — md5-content groups, keep the lowest id
   (operators.dedup.exact_duplicates);
2. **near dedup** — MinHash+LSH candidate pairs, exact-Jaccard verify,
   connected components, keep each cluster's canonical (lowest-id) doc
   (minhash_near_duplicates + connected_components);
2b. **frequent-segment dedup** (optional, ``frequent_segment_max``) —
   drop docs dominated by corpus-frequent k-token tiles, the CCNet
   segment-frequency stage (dedup.fixed_tile_profile) — catches heavy
   verbatim reuse below the minhash Jaccard threshold;
3. **quality filter** — heuristic score floor (operators.text.quality_scores);
4. **decontamination** — drop docs whose shingle overlap with a held-out
   benchmark corpus exceeds a threshold (corpus_prep.contamination_overlap);
5. **chunk** — token-window chunks ready for tokenization
   (corpus_prep.chunk_documents).

Everything stays lazy until the caller materializes the result; the
optional ``stats`` pass runs ONE count per stage boundary (aggregate-only
jobs, no data movement beyond each stage's own shuffles). Anti-joins
against the drop-sets are the scale-safe composition: the drop-sets are
id-only frames (tiny relative to the corpus) while the corpus itself
flows through exactly once.

The reference's pipeline stops at SQL ingestion (main.py:148-179); this
is the Spark-native continuation of the same data once landed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import corpus_prep as cp
from ..operators import dedup as dd
from ..operators import text as tx


@dataclass(frozen=True)
class CorpusPrepConfig:
    """Thresholds for the composed pipeline (defaults sized for the
    synthetic corpus; production values are corpus-specific)."""

    minhash_threshold: float = 0.4
    quality_floor: float = 0.35
    contamination_max: float = 0.8
    chunk_size: int = 32
    chunk_overlap: int = 8
    id_col: str = "doc_id"
    text_col: str = "text"
    # Keep each near-dup cluster's best-scored member instead of the
    # smallest id (the keep/drop policy a training corpus usually wants).
    canonical_by_quality: bool = False
    # Optional final cap: keep the best-scored survivors until their
    # cumulative token count reaches this budget (None = no cap).
    token_budget: int | None = None
    # Optional CCNet-style frequent-segment stage (None = off): drop a
    # doc when MORE THAN this fraction of its non-overlapping
    # ``segment_k``-token tiles occur in another document — catches
    # heavy verbatim reuse that sits BELOW the minhash Jaccard
    # threshold (a short doc quoting a long one shares few shingles
    # relative to the union but may be mostly borrowed tiles itself).
    frequent_segment_max: float | None = None
    segment_k: int = 8


def _exact_drops(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """ids of exact-duplicate copies (everything but each group's keeper)."""
    groups = dd.exact_duplicates(docs, cfg.id_col, cfg.text_col)
    dupes = groups.filter(F.col("n_copies") > 1)
    all_ids = docs.select(
        F.col(cfg.id_col), F.md5(F.col(cfg.text_col)).alias("content_hash")
    )
    return (
        all_ids.join(F.broadcast(dupes), "content_hash")
        .filter(F.col(cfg.id_col) != F.col("keeper_id"))
        .select(cfg.id_col)
    )


def _neardup_drops(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """ids of near-duplicate cluster members that are not the canonical
    doc. Default canonical = minimum id (cluster_id by construction);
    with ``canonical_by_quality`` the canonical is the best-scored member
    (score DESC, id ASC tie-break — same rule as Q:`dedup_canonical`)."""
    pairs = dd.minhash_near_duplicates(
        docs, cfg.id_col, cfg.text_col, threshold=cfg.minhash_threshold
    )
    comps = dd.connected_components(pairs)
    if not cfg.canonical_by_quality:
        return (
            comps.filter(F.col(cfg.id_col) != F.col("cluster_id"))
            .select(cfg.id_col)
        )
    from pyspark.sql import Window as W

    q = tx.quality_scores(docs, cfg.id_col, cfg.text_col).select(
        cfg.id_col, "quality_score"
    )
    ranked = W.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col(cfg.id_col)
    )
    return (
        comps.join(q, cfg.id_col)
        .withColumn("_rn", F.row_number().over(ranked))
        .filter(F.col("_rn") > 1)
        .select(cfg.id_col)
    )


def _frequent_segment_drops(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """ids of docs dominated by corpus-frequent tiles (shared fraction
    strictly above ``frequent_segment_max``) — the CCNet segment-
    frequency dedup stage, tile unit = dedup.fixed_tile_profile (the
    same machinery Q:`frequent_segment_filter` oracle-checks). Docs too
    short to tile never appear in the tile frame and are kept."""
    tiles = dd.fixed_tile_profile(docs, cfg.id_col, cfg.text_col, k=cfg.segment_k)
    freq = tiles.groupBy("tile_hash").agg(
        F.countDistinct(cfg.id_col).alias("_ndocs")
    )
    return (
        tiles.join(freq, "tile_hash")
        .groupBy(cfg.id_col)
        .agg(
            F.count("*").alias("_n_tiles"),
            F.sum((F.col("_ndocs") > 1).cast("long")).alias("_n_shared"),
        )
        .filter(
            F.col("_n_shared").cast("double")
            > F.lit(float(cfg.frequent_segment_max)) * F.col("_n_tiles")
        )
        .select(cfg.id_col)
    )


def _low_quality_drops(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    return (
        tx.quality_scores(docs, cfg.id_col, cfg.text_col)
        .filter(F.col("quality_score") < cfg.quality_floor)
        .select(cfg.id_col)
    )


def _contaminated_drops(
    docs: DataFrame, benchmark: DataFrame, cfg: CorpusPrepConfig
) -> DataFrame:
    return (
        cp.contamination_overlap(docs, benchmark, cfg.id_col, cfg.text_col)
        .filter(F.col("overlap_frac") > cfg.contamination_max)
        .select(cfg.id_col)
    )


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    cfg: CorpusPrepConfig = CorpusPrepConfig(),
    with_stats: bool = False,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full preparation pipeline; returns (chunks, stats).

    ``chunks`` is the chunked clean corpus (doc_id, chunk_idx,
    chunk_start, n_chunk_tokens, chunk_hash). ``stats`` counts survivors
    at each stage boundary when ``with_stats`` (one aggregate job per
    stage; {} otherwise).

    Each filter stage materializes only an id-frame of DROPS; the corpus
    is never re-shuffled between stages (anti-joins against broadcast-able
    id sets). At 100 TB the drop-sets are still small: duplicates,
    low-quality and contaminated docs are minorities of ids, not texts.
    """
    stats: dict[str, int] = {}
    if with_stats:
        stats["input"] = docs.count()

    stage1 = docs.join(
        _exact_drops(docs, cfg), cfg.id_col, "left_anti"
    )
    if with_stats:
        stats["after_exact_dedup"] = stage1.count()

    stage2 = stage1.join(
        _neardup_drops(stage1, cfg), cfg.id_col, "left_anti"
    )
    if with_stats:
        stats["after_near_dedup"] = stage2.count()

    stage2b = stage2
    if cfg.frequent_segment_max is not None:
        stage2b = stage2.join(
            _frequent_segment_drops(stage2, cfg), cfg.id_col, "left_anti"
        )
        if with_stats:
            stats["after_segment_dedup"] = stage2b.count()

    stage3 = stage2b.join(
        _low_quality_drops(stage2b, cfg), cfg.id_col, "left_anti"
    )
    if with_stats:
        stats["after_quality"] = stage3.count()

    stage4 = stage3
    if benchmark is not None:
        stage4 = stage3.join(
            _contaminated_drops(stage3, benchmark, cfg), cfg.id_col, "left_anti"
        )
        if with_stats:
            stats["after_decontamination"] = stage4.count()

    stage5 = stage4
    if cfg.token_budget is not None:
        doc_stats = tx.quality_scores(stage4, cfg.id_col, cfg.text_col).select(
            cfg.id_col, "n_tokens", "quality_score"
        )
        kept = cp.budget_select(doc_stats, cfg.token_budget, id_col=cfg.id_col).select(
            cfg.id_col
        )
        stage5 = stage4.join(kept, cfg.id_col, "left_semi")
        if with_stats:
            stats["after_budget"] = stage5.count()

    chunks = cp.chunk_documents(
        stage5, cfg.id_col, cfg.text_col, cfg.chunk_size, cfg.chunk_overlap
    )
    if with_stats:
        stats["chunks"] = chunks.count()
    return chunks, stats


def write_training_shards(
    docs: DataFrame,
    table_path: str,
    benchmark: DataFrame | None = None,
    cfg: CorpusPrepConfig = CorpusPrepConfig(),
    n_shards: int = 16,
    bin_budget: int = 256,
    shards_per_commit: int = 4,
    verify: bool = True,
) -> dict[str, int]:
    """The terminal stage every training-data team actually ships:
    dedup → filter → chunk (:func:`prepare_corpus`) → deterministic
    shard + pack-bin assignment (corpus_prep.shard_pack_assignments) →
    EXACTLY-ONCE sharded publish through the manifest sink.

    Commit protocol (all machinery from sources.manifest_sink — data
    dirs are write-once, readers see only manifest-listed batches):

    - shards are written in WAVES of ``shards_per_commit`` disjoint
      shard ids; each wave is one ``write_snapshot(mode="append")`` —
      data files land first, the (tiny) manifest commit makes them
      visible atomically;
    - a crash between waves loses nothing: committed waves are visible,
      the in-flight wave's data dir has no manifest entry (invisible;
      ``vacuum`` reclaims it), and a re-run RESUMES — it recomputes the
      deterministic assignment, reads the snapshot's already-committed
      shard ids (one column-pruned scan of the shard_id column), and
      writes only the missing shards;
    - a re-run after full completion is a no-op (zero missing shards) —
      idempotent end-to-end, because shard membership is a pure
      function of document content/ids (md5 buckets + prefix sums, no
      RNG, no partitioning dependence).

    Single-writer assumption (same as any batch publisher): two
    concurrent runs against one table can both commit a shard. The
    ``verify`` pass catches that loudly — it compares per-shard row
    counts in the final snapshot against the computed assignment and
    raises on any duplicate or missing shard (one aggregate per side).

    Returns ``{"written_shards": w, "skipped_shards": s, "rows": n}``.

    Scale: the expensive lineage (prepare_corpus) is persisted once and
    reused by every wave — without it each wave would re-run dedup's
    LSH joins. (Recompute of a lost block is safe: the assignment is a
    pure md5/prefix-sum function of the input, the property
    Q:`training_shard_plan` pins.) Each wave repartitions by shard_id
    so one shard's rows land contiguously (one output partition per
    shard), which is the layout a training loader reads.
    """
    from ..sources import manifest_sink as ms

    spark = docs.sparkSession
    chunks, _ = prepare_corpus(docs, benchmark, cfg)
    assigned = cp.shard_pack_assignments(
        chunks, n_shards=n_shards, budget=bin_budget, id_col=cfg.id_col
    )
    # Materialize the assignment ONCE: every wave filters this frame,
    # and the verify pass aggregates it — without the persist, wave k
    # would re-run the whole prepare_corpus lineage (LSH joins, quality
    # scans) k times. persist + explicit unpersist in the finally keeps
    # the release deterministic (prepare_corpus's own internal caches
    # follow the package convention: caller runs dedup.unpersist_all()).
    assigned = assigned.persist()
    assigned.count()
    try:
        committed: set[int] = set()
        if ms.current_version(spark, table_path) > 0:
            committed = {
                r[0]
                for r in ms.read_snapshot(spark, table_path)
                .select("shard_id")
                .distinct()
                .collect()
            }
        # Only shards that actually carry rows: an EMPTY shard id has
        # nothing to commit, and treating it as forever-missing would
        # append a junk batch dir on every re-run.
        present = sorted(
            r[0] for r in assigned.select("shard_id").distinct().collect()
        )
        missing = [s for s in present if s not in committed]
        for i in range(0, len(missing), shards_per_commit):
            wave = missing[i : i + shards_per_commit]
            part = assigned.filter(F.col("shard_id").isin(wave)).repartition(
                len(wave), "shard_id"
            )
            ms.write_snapshot(part, table_path, mode="append")
        if verify:
            # An all-filtered-out corpus commits nothing and the table
            # may not exist at all — that is a correct empty publish,
            # not a read error.
            snap_counts: set = set()
            if ms.current_version(spark, table_path) > 0:
                snap_counts = {
                    (r[0], r[1])
                    for r in ms.read_snapshot(spark, table_path)
                    .groupBy("shard_id")
                    .count()
                    .collect()
                }
            want_counts = {
                (r[0], r[1])
                for r in assigned.groupBy("shard_id").count().collect()
            }
            if snap_counts != want_counts:
                raise RuntimeError(
                    "training-shard verify failed: snapshot per-shard "
                    f"counts {sorted(snap_counts)} != computed "
                    f"{sorted(want_counts)} — duplicate or missing "
                    "shards (concurrent writer?); vacuum + rewrite"
                )
        n_rows = assigned.count()
        return {
            "written_shards": len(missing),
            "skipped_shards": len(committed),
            "rows": n_rows,
        }
    finally:
        # Release the cached assignment; the published table is the
        # durable artifact.
        assigned.unpersist()
