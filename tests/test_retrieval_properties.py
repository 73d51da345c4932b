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

VECTOR_QUERIES_UNDER_TEST = ("semdedup_keep", "ann_mmr_topk")


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
