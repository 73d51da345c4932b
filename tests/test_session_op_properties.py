"""Property tests for the late-round operators vs independent Python
reference models — the same strategy test_transforms_properties.py uses
for the T-operators: generated inputs reach interleavings, gaps, and
tie shapes fixed fixtures don't, and the Python model is simple enough
to be obviously correct.

One Spark job per generated batch; hypothesis shrinks on the batch.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


# ---------------------------------------------------------------------------
# cdc_apply vs a dict fold: last op per key under the total order wins,
# trailing deletes drop the key.
# ---------------------------------------------------------------------------

cdc_logs = st.lists(
    st.tuples(
        st.integers(0, 4),              # key
        st.sampled_from(["U", "D"]),    # op
        st.text("ab", max_size=3),      # state payload
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(log=cdc_logs)
def test_cdc_apply_matches_python_fold(spark, log):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.scd import cdc_apply

    rows = [(k, seq, op, state) for seq, (k, op, state) in enumerate(log)]
    df = spark.createDataFrame(rows, ["k", "seq", "op", "state"])
    got = {r.k: r.state for r in cdc_apply(df, ["k"], ["seq"]).collect()}

    want: dict[int, str] = {}
    for k, op, state in log:  # fold in seq order: last writer wins
        if op == "D":
            want.pop(k, None)
            want[k] = None  # tombstone marker: key seen, currently dead
        else:
            want[k] = state
    want = {k: v for k, v in want.items() if v is not None}
    assert got == want


# ---------------------------------------------------------------------------
# merge_aggregate_state: merge(state(A), state(B)) == state(A ∪ B) for
# ANY split of the rows — the associativity identity, cents-exact.
# ---------------------------------------------------------------------------

value_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(-10_000, 10_000),   # cents → exact at scale 2
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=value_rows, split=st.integers(0, 30))
def test_merge_equals_full_recompute_for_any_split(spark, rows, split):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.maintenance import (
        aggregate_state,
        finalize_aggregate_state,
        merge_aggregate_state,
    )

    data = [(k, cents / 100.0) for k, cents in rows]
    cut = min(split, len(data))
    mk = lambda part: spark.createDataFrame(part, ["k", "v"])  # noqa: E731

    full = aggregate_state(mk(data), ["k"], "v", scale=2)
    if cut == 0 or cut == len(data):
        merged = full  # empty side: merge with nothing is identity here
    else:
        merged = merge_aggregate_state(
            aggregate_state(mk(data[:cut]), ["k"], "v", scale=2),
            aggregate_state(mk(data[cut:]), ["k"], "v", scale=2),
            ["k"],
        )
    f = {
        r.k: (r.n_rows, r.total_value, r.min_value, r.max_value)
        for r in finalize_aggregate_state(full, ["k"]).collect()
    }
    m = {
        r.k: (r.n_rows, r.total_value, r.min_value, r.max_value)
        for r in finalize_aggregate_state(merged, ["k"]).collect()
    }
    assert m == f


# ---------------------------------------------------------------------------
# undirected_pagerank vs a pure-Python quantized iteration on random
# small graphs — same integer arithmetic, same fixed iterations.
# ---------------------------------------------------------------------------

edge_sets = st.sets(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=12,
)


def _py_pagerank(edges, n_iters=3):
    import math

    from cig_etl_s3_to_sql_data_ingestor_spark.operators.graph import (
        PR_BASE,
        PR_DAMPING,
        PR_TELEPORT,
    )

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {u: len(vs) for u, vs in adj.items()}
    rank = {u: PR_BASE for u in adj}
    for _ in range(n_iters):
        contrib = {u: math.floor(rank[u] / deg[u]) for u in adj}
        nxt = {}
        for u, vs in adj.items():
            s = sum(contrib[v] for v in vs)
            nxt[u] = math.floor(PR_TELEPORT + PR_DAMPING * s)
        rank = nxt
    return rank


@SETTINGS
@given(edges=edge_sets)
def test_pagerank_matches_python_model(spark, edges):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.graph import (
        undirected_pagerank,
    )

    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    got = {r.node: r.pr for r in undirected_pagerank(df).collect()}
    assert got == _py_pagerank(edges)


# ---------------------------------------------------------------------------
# jaccard_overlap_pairs: grouped strategy == join strategy == a Python
# set model, for random membership frames and caps. The fixture test
# (test_dedup_ops) pins known cap boundaries; this reaches arbitrary
# df distributions, singleton keys, and all-hot-item shapes.
# ---------------------------------------------------------------------------

memberships = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 8)),  # (key, item)
    min_size=1,
    max_size=40,
)


def _py_capped_jaccard(pairs, cap):
    items_by_key: dict[int, set[int]] = {}
    for k, i in pairs:
        items_by_key.setdefault(k, set()).add(i)
    df_by_item: dict[int, int] = {}
    for k, s in items_by_key.items():
        for i in s:
            df_by_item[i] = df_by_item.get(i, 0) + 1
    keys = sorted(items_by_key)
    out = {}
    for a_idx, a in enumerate(keys):
        for b in keys[a_idx + 1:]:
            shared = {
                i
                for i in items_by_key[a] & items_by_key[b]
                if cap is None or df_by_item[i] <= cap
            }
            if shared:
                na, nb = len(items_by_key[a]), len(items_by_key[b])
                out[(a, b)] = (
                    len(shared),
                    na,
                    nb,
                    len(shared) / (na + nb - len(shared)),
                )
    return out


@SETTINGS
@given(pairs=memberships, cap=st.sampled_from([None, 1, 2, 3]))
def test_jaccard_strategies_match_python_set_model(spark, pairs, cap):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import (
        jaccard_overlap_pairs,
    )

    # The join strategy's contract requires a DISTINCT membership frame
    # (the grouped strategy's collect_set dedups implicitly either way).
    pairs = sorted(set(pairs))
    sets = spark.createDataFrame(pairs, ["key", "item"])
    want = _py_capped_jaccard(pairs, cap)
    for strategy in ("join", "grouped"):
        got = {
            (r.key_a, r.key_b): (r.shared, r.n_a, r.n_b, r.jaccard)
            for r in jaccard_overlap_pairs(
                sets, "key", "item", max_item_df=cap, strategy=strategy
            ).collect()
        }
        assert got == want, (strategy, cap)


# ---------------------------------------------------------------------------
# pq_search_packed == pq_topk on random corpora: the packed path
# replicates Spark's l2sq/dot IEEE folds in driver-side Python — any
# fold-order or quantization drift shows up as a rank flip somewhere in
# a randomized corpus long before a user sees it. The fixture test
# (test_ann_recall) pins the real embeddings table; this reaches
# arbitrary value distributions (incl. negatives and near-ties).
# ---------------------------------------------------------------------------

vec_corpora = st.lists(
    st.lists(
        st.floats(-4, 4, allow_nan=False, allow_infinity=False, width=32),
        min_size=8,
        max_size=8,
    ),
    min_size=12,
    max_size=24,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(vecs=vec_corpora)
def test_packed_search_matches_join_path_on_random_vectors(spark, vecs):
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import (
        _persist,
        unpersist_all,
    )

    # Degenerate all-equal corpora still exercise the tie-break chain.
    e = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    n_sub, n_codes, k = 4, 4, 3
    try:
        subs = _persist(S._subvectors(e, n_sub, "vec_id", "embedding"))
        cb = _persist(
            S.pq_train_codebooks(e, n_sub=n_sub, n_codes=n_codes, subs=subs)
        )
        codes = _persist(
            S.pq_encode(e, cb, n_sub=n_sub, subs=subs)
        )
        cb_rows = [
            tuple(r) for r in cb.select("m", "code_id", "code_vec").collect()
        ]
        packed = _persist(S.pq_pack_codes(codes, cb_rows))
        q = e.filter("vec_id < 3")
        q_rows = [
            tuple(r) for r in q.select("vec_id", "embedding").collect()
        ]
        want = sorted(
            tuple(r)
            for r in S.pq_topk(
                e, q, k=k, n_sub=n_sub, n_codes=n_codes,
                codebooks=cb, codes=codes,
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in S.pq_search_packed(
                e, q_rows, cb_rows, packed, k=k, n_sub=n_sub
            ).collect()
        )
        assert got == want
    finally:
        unpersist_all()
