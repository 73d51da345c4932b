"""Hybrid lexical+vector retrieval over the PERSISTED streaming stores —
the production search shape: query the accumulated BM25 inverted index
(:class:`~.bm25_ingest.Bm25IndexIngest`) and the accumulated IVF vector
index (:class:`~.vector_ingest.VectorIngest`), fuse the two ranked lists
with reciprocal-rank fusion, return the top-k.

The batch query ``hybrid_rrf_search`` (queries/mining.py) pins the
FUSION RULE against the DuckDB oracle; both providers pin their
store-search-equals-batch-rebuild contracts in tests/test_streaming.py.
This module only composes those three proven parts — it owns no scoring
math of its own, so the store-backed hybrid cannot drift from the
oracle-backed batch form.

Scale shape: each provider's search is already bounded (BM25 by the
query vocabulary's term buckets, IVF by the probed cells), and the
fusion join is |Q| x (k_a + k_b) rows — the corpus is touched only
inside the providers. Reference parity: the reference repo has no
retrieval surface; this extends its ingest-and-query model to the
search shapes a training-data pipeline runs against its stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import rrf_fuse
from .bm25_ingest import Bm25IndexIngest
from .vector_ingest import VectorIngest


def hybrid_search_from_stores(
    bm25_store: Bm25IndexIngest,
    vector_store: VectorIngest,
    terms: DataFrame,
    query_vectors: DataFrame,
    k: int = 10,
    k0: int = 60,
    bm25_k: int = 10,
    ann_k: int = 20,
    n_probe: int = 4,
) -> DataFrame:
    """Fused top-``k`` per query over the two persisted indexes.

    ``terms`` is the lexical side's (query_id, term) frame;
    ``query_vectors`` the vector side's (id_col, vec_col) frame — the
    SAME query_id space (the caller aligns them, exactly as
    ``hybrid_rrf_search`` aligns documents and embeddings). Each
    provider list is fetched at its own depth (``bm25_k`` / ``ann_k``)
    and fused as 1/(k0+rank_a) + 1/(k0+rank_b), missing lists
    contributing 0, ties on candidate id — rrf_fuse's oracle-pinned
    rule, unchanged."""
    # The BM25 store normalizes its id column to ``doc_id`` at rest
    # (any integral id_col casts to long on write), so search output is
    # ``doc_id`` regardless of the ingest's id_col.
    lex = bm25_store.search(terms, k=bm25_k).select(
        "query_id", F.col("doc_id").alias("cand_id"), "rank"
    )
    sem = vector_store.search(query_vectors, k=ann_k, n_probe=n_probe).select(
        "query_id", "cand_id", "rank"
    )
    return rrf_fuse(lex, sem, k=k, k0=k0)
