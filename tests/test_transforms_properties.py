"""Property-based tests: the T-operator Column expressions vs independent
Python models of the reference semantics (SURVEY §2.7), over adversarial
generated strings — regex-escaping bugs, unicode, embedded sentinels, and
null handling that fixed fixtures won't reach.

One Spark job evaluates a whole generated batch (hypothesis shrinks on
the batch), keeping runtime sane.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators import transforms as TR

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Text including sentinel fragments and regex metachars.
fragments = st.sampled_from(
    ["NaT", "nan", "None", "True", "False", ".0", "1.0", "a", "\\", ".", "*", "é", " "]
)
texts = st.one_of(
    st.text(max_size=12),
    st.lists(fragments, max_size=5).map("".join),
)
cells = st.one_of(st.none(), texts)
batches = st.lists(cells, min_size=1, max_size=60)


def run_column(spark, values, colfn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(colfn(F.col("v")).alias("o")).collect()]


# --- Independent models of the reference semantics ---------------------


def model_sentinel(v):  # T4: whole-cell only (`CigEolHostingIngestionLogic.py:24-30`)
    if v is None:
        return None
    return {"NaT": "None", "nan": "None", "True": "1", "False": "0"}.get(v, v)


def model_strip_decimal(v):  # T6: all '.0' removed IF endswith (`:61-73`)
    if v is None:
        return None
    return v.replace(".0", "") if v.endswith(".0") else v


def model_scrub(v):  # T9: substring replace, null -> '' (`:106-112`)
    return ("" if v is None else v).replace("None", "")


def model_null(v):  # T12: literal 'None' -> NULL (`ParquetFileInsertion.py:68-75`)
    return None if v == "None" else v


def model_env(v):  # T1 intent (`main_mailbox.py:56`)
    if v is None:
        return None
    return v.split("_")[0] if len(v) > 2 else v


@pytest.mark.parametrize(
    "colfn,model",
    [
        (TR.sentinel_replace, model_sentinel),
        (TR.strip_decimal_suffix, model_strip_decimal),
        (TR.not_nullable_scrub, model_scrub),
        (TR.materialize_null, model_null),
        (TR.derive_environment, model_env),
    ],
    ids=["T4_sentinel", "T6_decimal", "T9_scrub", "T12_null", "T1_env"],
)
@SETTINGS
@given(values=batches)
def test_transform_matches_model(spark, colfn, model, values):
    assert run_column(spark, values, colfn) == [model(v) for v in values]


int_strings = st.one_of(
    st.integers(-(10**15), 10**15).map(lambda i: f"{i}.0"),
    st.integers(-(10**15), 10**15).map(str),
    st.just("None"),
    st.none(),
    st.text(st.characters(whitelist_categories=["Ll"]), max_size=5),  # unparsable
)


def model_normalize_int(v):  # T6/T7 combined normalize
    if v is None or v == "None":
        return v
    try:
        f = float(v)
    except ValueError:
        return None
    if f != f or f in (float("inf"), float("-inf")):
        return None
    return str(int(f))


@SETTINGS
@given(values=st.lists(int_strings, min_size=1, max_size=60))
def test_normalize_int_string_matches_model(spark, values):
    got = run_column(spark, values, TR.normalize_int_string)
    want = [model_normalize_int(v) for v in values]
    assert got == want


@st.composite
def random_graphs(draw):
    n = draw(st.integers(2, 40))
    n_edges = draw(st.integers(1, 60))
    edges = [
        tuple(sorted(draw(st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)))))
        for _ in range(n_edges)
    ]
    return [(a, b) for a, b in edges if a != b]


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(edges=random_graphs())
def test_connected_components_matches_union_find(spark, edges):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import (
        connected_components,
    )

    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert got == _union_find_components(edges)
