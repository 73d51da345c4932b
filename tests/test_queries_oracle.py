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


# Genuinely non-cross-engine-expressible queries (documented per entry);
# the driver records a rows-only check for these, and dedicated tests
# bound their error instead (tests/test_sketches.py).
NO_ORACLE_ALLOWED = {"approx_distinct_stats"}


def test_all_queries_have_oracles_or_are_documented():
    missing = set(QUERIES) - set(ORACLES)
    assert missing == NO_ORACLE_ALLOWED, f"queries missing oracles: {missing}"
