"""End-to-end corpus preparation: the composed pipeline a training-data
team runs between "raw documents landed" and "chunks ready to tokenize".

Stages (each one an operator that is also independently oracle-checked
through its ``queries()`` entry):

1. **exact dedup** — md5-content groups, keep the lowest id
   (operators.dedup.exact_duplicates);
2. **near dedup** — MinHash+LSH candidate pairs, exact-Jaccard verify,
   connected components, keep each cluster's canonical (lowest-id) doc
   (minhash_near_duplicates + connected_components);
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

    stage3 = stage2.join(
        _low_quality_drops(stage2, cfg), cfg.id_col, "left_anti"
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
