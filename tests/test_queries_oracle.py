"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the same comparison shape the driver's correctness gate uses."""

from __future__ import annotations

import pytest

from cig_etl_s3_to_sql_data_ingestor_spark.queries import ORACLES, QUERIES

from .oracle_harness import compare

CASES = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    n = compare(spark, sf_dir, QUERIES[name], ORACLES[name], name)
    assert n >= 0


# Every query now carries a DuckDB oracle — sketch queries emit exact
# anchors plus deterministic in-envelope booleans instead of raw
# engine-specific estimates (see queries/corpus.py approx_distinct_stats).
NO_ORACLE_ALLOWED: set[str] = set()


def test_all_queries_have_oracles_or_are_documented():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == NO_ORACLE_ALLOWED, f"queries missing oracles: {missing}"
