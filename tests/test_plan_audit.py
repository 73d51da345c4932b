"""Full-surface scale audit as a regression gate: every registered
query's physical plan is scanned for the unambiguous 100 TB killers
(cartesian products, unallowlisted broadcast nested-loop joins,
unpartitioned windows over unbounded frames). The targeted pins in
test_plans.py go deep on specific queries; this guarantees breadth —
no NEW query can ship with one of these shapes unnoticed.
"""

from __future__ import annotations

import importlib.util
import os

from cig_etl_s3_to_sql_data_ingestor_spark.queries import QUERIES

_spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plan_audit)


def test_allowlists_reference_only_registered_queries():
    """A renamed/removed query must not leave a stale allowlist entry
    silently waiving the check for nothing."""
    assert plan_audit.BNLJ_ALLOWED <= set(QUERIES)
    assert plan_audit.GLOBAL_WINDOW_ALLOWED <= set(QUERIES)


def test_no_query_plan_contains_a_scale_killer(spark, sf_dir):
    problems = plan_audit.audit(spark, sf_dir)
    assert not problems, problems
