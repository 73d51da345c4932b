"""Property-based differential tests for the round-6 retrieval/mining
queries: generate adversarial micro-corpora (tiny docs, empty docs,
skewed token repetition), write them as a real ``documents.parquet``,
and run the REGISTERED query against its REGISTERED DuckDB oracle via
the same compare the driver's correctness gate uses — a fixture-free
sweep over corpus shapes the sf fixtures never reach (all-empty docs,
single-token corpora, every-doc-identical, bigram floors straddling
PMI_MIN_COUNT).
"""

from __future__ import annotations

import os
import tempfile

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cig_etl_s3_to_sql_data_ingestor_spark.io import TABLES
from cig_etl_s3_to_sql_data_ingestor_spark.queries import ORACLES, QUERIES

from .oracle_harness import compare

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# The alphabet covers the fixed BM25 query terms AND every token of the
# fixed phrase workload, so generated corpora actually hit the queries.
tokens = st.sampled_from(
    ["hash", "join", "slow", "query", "table", "scan", "key", "value", "batch"]
)
corpora = st.lists(
    st.lists(tokens, min_size=0, max_size=10), min_size=1, max_size=8
)

QUERIES_UNDER_TEST = (
    "bm25_search",
    "bm25_incremental",
    "phrase_search",
    "phrase_search_indexed",  # r7: must agree with the oracle (and thus
    # the direct path) on every generated corpus shape, not just the
    # fixtures — empty docs, sub-phrase-length docs, all-identical docs.
    "collocation_pmi",
    # r9: the hybrid's BM25 arm over adversarial generated corpora
    # (empty docs, all-identical docs, sub-k docs) fused with the
    # symlinked fixture embeddings — the flip side of the vector sweep.
    "hybrid_rrf_search",
    # r9: triplet mining — tiny sets exercise label-singleton anchors
    # (no in-class positive -> anchor drops) and all-violating margins.
    "contrastive_triplets",
)


def _materialize(corpus: list[list[str]]) -> str:
    """Write the generated corpus as <tmp>/documents.parquet and symlink
    the sibling tables (duckdb_conn creates a view per TABLE eagerly)."""
    tmp = tempfile.mkdtemp(prefix="retrieval-prop-")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    for i, toks in enumerate(corpus):
        text = " ".join(toks)
        con.execute(
            "INSERT INTO d VALUES (?, ?, 'en', 'gen', ?)", [i, text, len(text)]
        )
    con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in TABLES:
        if t != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet"
            )
    return tmp


@SETTINGS
@given(corpus=corpora)
def test_retrieval_queries_match_oracles_on_generated_corpora(spark, corpus):
    sf_dir = _materialize(corpus)
    for name in QUERIES_UNDER_TEST:
        compare(spark, sf_dir, QUERIES[name], ORACLES[name], f"{name}[gen]")


# Components are exact binary fractions (float32-exact, so the FLOAT[]
# parquet round-trip changes nothing on either engine) and never all
# zero, so no cosine is NaN.
components = st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0])
vector_sets = st.lists(
    st.lists(components, min_size=4, max_size=4), min_size=2, max_size=12
)

VECTOR_QUERIES_UNDER_TEST = (
    "semdedup_keep",
    "ann_mmr_topk",
    # r9 retrieval completions. Generated sets are 4-dim / 2-12 vectors,
    # which stresses shapes the 64-dim fixtures never reach:
    # truncated_rerank's 16-dim prefix CLAMPS to the whole vector on
    # both engines (slice past the end), hard negatives run with 1-11
    # candidates and i%3 labels, the metrics harness hits empty and
    # tiny relevance pools, and the RRF hybrid fuses the generated
    # embeddings against the symlinked sf0.001 documents (ids need not
    # align — rank fusion is id-agnostic).
    "hard_negative_mining",
    "ann_truncated_rerank",
    "retrieval_quality_metrics",
    "hybrid_rrf_search",
)


def _materialize_vectors(vectors: list[list[float]]) -> str:
    tmp = tempfile.mkdtemp(prefix="vector-prop-")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    for i, v in enumerate(vectors):
        con.execute("INSERT INTO e VALUES (?, ?, ?)", [i, v, i % 3])
    con.execute(f"COPY e TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    for t in TABLES:
        if t != "embeddings":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet"
            )
    return tmp


@SETTINGS
@given(vectors=vector_sets)
def test_vector_curation_queries_match_oracles_on_generated_vectors(
    spark, vectors
):
    sf_dir = _materialize_vectors(vectors)
    for name in VECTOR_QUERIES_UNDER_TEST:
        compare(spark, sf_dir, QUERIES[name], ORACLES[name], f"{name}[gen]")


# --- round-7 curation queries: adversarial TEXT shapes -----------------------
#
# The r7 operators are sensitive to text shapes the retrieval alphabet
# never produces: unicode multi-byte chars (md5-over-UTF-8 parity and
# char-vs-byte substr), symbol runs ('#', '...'), stopword boundaries
# (exactly 2 Gopher stop hits), tie-heavy low-entropy shingles
# (winnowing's rightmost-min rule), and zero-length docs (weight filter,
# one-empty-token tokenization).
curation_tokens = st.sampled_from(
    [
        "the", "of", "and",           # Gopher stopword boundary
        "a", "zz", "word",            # mean-word-length extremes
        "###", "...", "#tag",         # symbol-ratio rule
        "naïve", "çédille", "日本語",   # multi-byte UTF-8 (md5 + substr parity)
        "aaaaa", "aaaab",             # tie-heavy 5-gram shingles
        "12345", "9",                 # non-alphabetic tokens
    ]
)
curation_corpora = st.lists(
    st.lists(curation_tokens, min_size=0, max_size=12), min_size=1, max_size=8
)

CURATION_QUERIES_UNDER_TEST = (
    "gopher_quality_rules",
    "winnowing_sites",
    "winnowing_groups",
    "winnowing_matches",
    "curation_pipeline",
    "dataset_report",
    "cdc_chunks",
    "cdc_chunk_dedup",
    "weighted_sample",
    "dsir_importance_weights",
)


@SETTINGS
@given(corpus=curation_corpora)
def test_curation_queries_match_oracles_on_generated_corpora(spark, corpus):
    sf_dir = _materialize_mixed_sources(corpus)
    for name in CURATION_QUERIES_UNDER_TEST:
        compare(spark, sf_dir, QUERIES[name], ORACLES[name], f"{name}[gen]")


def _materialize_mixed_sources(corpus: list[list[str]]) -> str:
    """Like _materialize, but docs alternate sources (DSIR's target is
    source='src0' — a single-source corpus would degenerate its
    target/source split) and n_chars matches the generator convention."""
    tmp = tempfile.mkdtemp(prefix="curation-prop-")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    for i, toks in enumerate(corpus):
        text = " ".join(toks)
        con.execute(
            "INSERT INTO d VALUES (?, ?, 'en', ?, ?)",
            [i, text, f"src{i % 3}", len(text)],
        )
    con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in TABLES:
        if t != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet"
            )
    return tmp
