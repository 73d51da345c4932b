"""Behavioral tests for the round-6 additions: BM25 ranked keyword
retrieval (operators/text.bm25_topk) and SemDeDup per-vector curation
decisions (operators/similarity.semdedup_decisions).

The registry sweep (test_queries_oracle) proves oracle parity; these
tests pin the SEMANTICS on hand-built corpora where the right answer is
known by construction — term-density and idf ordering for BM25, and the
keep-most-central / evict-by-higher-rank contract for SemDeDup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
    semdedup_decisions,
)
from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _terms(spark, rows):
    return spark.createDataFrame(rows, "query_id long, term string")


def test_bm25_ranks_by_term_density(spark):
    # Same doc length everywhere; the doc repeating the query term most
    # must rank first, and a doc without the term must not appear.
    docs = _docs(
        spark,
        [
            (1, "cat cat cat dog"),
            (2, "cat dog dog dog"),
            (3, "dog dog dog dog"),
            (4, "cat cat dog dog"),
        ],
    )
    out = bm25_topk(docs, _terms(spark, [(0, "cat")]), k=10).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 4, 2]  # tf 3 > 2 > 1; doc 3 never matches
    assert all(r.score > 0 for r in out)


def test_bm25_shorter_doc_wins_at_equal_tf(spark):
    # Equal tf, different lengths: BM25's length normalization must
    # favor the shorter document.
    docs = _docs(
        spark,
        [
            (1, "cat dog"),
            (2, "cat dog dog dog dog dog dog dog"),
        ],
    )
    out = bm25_topk(docs, _terms(spark, [(0, "cat")]), k=10).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 2]


def test_bm25_idf_favors_rare_terms(spark):
    # "rare" appears in one doc, "common" in all four: with one query
    # containing both terms, the rare-term doc must outrank docs that
    # match only the ubiquitous term.
    docs = _docs(
        spark,
        [
            (1, "common rare pad pad"),
            (2, "common pad pad pad"),
            (3, "common pad pad pad"),
            (4, "common pad pad pad"),
        ],
    )
    out = bm25_topk(docs, _terms(spark, [(0, "common"), (0, "rare")]), k=10).collect()
    top = min(out, key=lambda r: r.rank)
    assert top.doc_id == 1
    # Every doc matches "common", so all four rank.
    assert len(out) == 4


def test_bm25_duplicate_query_terms_count_once(spark):
    # Set semantics: a repeated (query_id, term) row must not multiply
    # the term's contribution — query 0 (with the duplicate) and query 1
    # (without) must produce identical scores.
    docs = _docs(spark, [(1, "cat cat dog"), (2, "cat dog dog")])
    terms = _terms(spark, [(0, "cat"), (0, "cat"), (1, "cat")])
    out = bm25_topk(docs, terms, k=10).collect()
    scores = {}
    for r in out:
        scores.setdefault(r.query_id, {})[r.doc_id] = r.score_q
    assert scores[0] == scores[1]


def test_bm25_multiple_queries_are_independent(spark):
    docs = _docs(spark, [(1, "cat cat"), (2, "dog dog")])
    terms = _terms(spark, [(0, "cat"), (1, "dog")])
    out = bm25_topk(docs, terms, k=10).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r.doc_id)
    assert by_query == {0: [1], 1: [2]}


def test_bm25_indexed_path_identical_to_direct(spark, sf_dir):
    # The build-once/search-many path (bm25_build_index +
    # bm25_search_indexed) must produce the exact rows of the direct
    # path — both share _bm25_rank, and a full-vocabulary df equals the
    # query-restricted df for the searched terms.
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_build_index,
        bm25_search_indexed,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )

    docs = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    direct = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    postings, dfreq, stats = bm25_build_index(docs)
    indexed = sorted(
        map(tuple, bm25_search_indexed(postings, dfreq, stats, terms, k=10).collect())
    )
    assert direct == indexed and len(direct) > 0


def test_bm25_merge_equals_rebuild(spark, sf_dir):
    # Merging disjoint-split indexes must reproduce the full rebuild
    # EXACTLY — postings rows, per-term df, and corpus stats.
    from cig_etl_s3_to_sql_data_ingestor_spark.functions.hashing import md5_bucket
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_build_index,
        bm25_merge_index,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id"), 4)
    merged = bm25_merge_index(
        *bm25_build_index(docs.filter(bucket != 0)),
        *bm25_build_index(docs.filter(bucket == 0)),
    )
    rebuilt = bm25_build_index(docs)
    for m, r in zip(merged, rebuilt):
        assert sorted(map(tuple, m.collect())) == sorted(map(tuple, r.collect()))


def test_bm25_merge_with_empty_batch_is_identity(spark, sf_dir):
    # An empty crawl batch must leave the index unchanged — including
    # the stats row, where the empty side's SUM(total_len) is NULL and
    # the merge's integer sum must skip it, not null the total.
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_build_index,
        bm25_merge_index,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    merged = bm25_merge_index(
        *bm25_build_index(docs), *bm25_build_index(docs.filter(F.lit(False)))
    )
    rebuilt = bm25_build_index(docs)
    for m, r in zip(merged, rebuilt):
        assert sorted(map(tuple, m.collect())) == sorted(map(tuple, r.collect()))


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmr_demotes_redundant_candidates(spark):
    # Query along e1. Candidates: two near-identical vectors hugging e1
    # (ids 1, 2 — the pure-relevance top-2) and a diverse one at ~45
    # degrees (id 3). MMR must pick one twin first, then the DIVERSE
    # candidate — relevance-only ranking would pick both twins.
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    # Geometry note: the twins must NOT sit on the query's own axis —
    # if the first pick equals the query direction, MMR algebraically
    # reduces to (2*lam - 1) * rel and can never reorder anything. Off-
    # axis twins ([1, .49] twice) vs a same-relevance-class diverse
    # candidate mirrored across the query axis ([1, -.5], sim to the
    # twins ~0.61) give diversity a real penalty gap to win on.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),     # the query itself
        (1, [1.0, 0.49, 0.0, 0.0]),
        (2, [1.0, 0.49, 0.001, 0.0]),
        (3, [1.0, -0.5, 0.0, 0.0]),
    ]
    e = _vecs(spark, rows)
    q = e.filter("vec_id = 0")
    rel_order = [
        r.cand_id
        for r in brute_force_topk(e, q, k=3).orderBy("rank").collect()
    ]
    assert rel_order[:2] in ([1, 2], [2, 1])  # twins lead on relevance
    mmr_order = [
        r.cand_id
        for r in mmr_rerank(e, q, k=3, shortlist=3, lam=0.75)
        .orderBy("rank")
        .collect()
    ]
    assert mmr_order[0] in (1, 2)
    assert mmr_order[1] == 3  # diversity beats the redundant twin
    assert set(mmr_order) == {1, 2, 3}


def test_semdedup_keeps_lowest_id_of_exact_duplicates(spark):
    # Two identical vectors tie on centroid_sim, so the id-ascending
    # tie-break must keep the lower id and evict the higher, recording
    # the keeper in dup_of. The third vector is orthogonal: kept.
    e = _vecs(
        spark,
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [1.0, 0.0, 0.0, 0.0]),
            (12, [0.0, 1.0, 0.0, 0.0]),
        ],
    )
    out = {
        r.vec_id: r
        for r in semdedup_decisions(
            e, n_cells=2, n_iters=1, threshold=0.9, sample_mod=None
        ).collect()
    }
    assert out[10].kept == 1 and out[10].dup_of is None
    assert out[11].kept == 0 and out[11].dup_of == 10
    assert out[12].kept == 1


def test_semdedup_keeps_most_central_member(spark):
    # Cell seeded at id 0 (sorted init); among near-parallel vectors the
    # one most similar to the trained centroid survives, others are
    # evicted with dup_of pointing at the survivor. The far vector in
    # the second cell is untouched.
    e = _vecs(
        spark,
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [1.0, 0.1, 0.0, 0.0]),
            (3, [1.0, -0.1, 0.0, 0.0]),
        ],
    )
    rows = semdedup_decisions(
        e, n_cells=2, n_iters=1, threshold=0.95, sample_mod=None
    ).collect()
    out = {r.vec_id: r for r in rows}
    cell_of_0 = out[0].cell_id
    same_cell = [r for r in rows if r.cell_id == cell_of_0]
    kept = [r for r in same_cell if r.kept == 1]
    dropped = [r for r in same_cell if r.kept == 0]
    # Exactly one survivor per tight group, and every evicted row points
    # at a member that outranks it (closer to the centroid, or tied with
    # a lower id).
    assert len(kept) >= 1 and dropped, (kept, dropped)
    best = max(same_cell, key=lambda r: (r.centroid_sim, -r.vec_id))
    assert out[best.vec_id].kept == 1
    for r in dropped:
        killer = out[r.dup_of]
        assert killer.cell_id == r.cell_id
        assert (killer.centroid_sim, -killer.vec_id) > (
            r.centroid_sim,
            -r.vec_id,
        )
    # The orthogonal vector's cell is independent.
    assert out[1].kept == 1


def test_semdedup_every_vector_gets_exactly_one_decision(spark, sf_dir):
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    out = semdedup_decisions(e, n_cells=8, n_iters=2, threshold=0.33)
    n = e.count()
    rows = out.collect()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    for r in rows:
        assert (r.kept == 1) == (r.dup_of is None)


def test_mmr_shortlist_plugin_identical(spark, sf_dir):
    """mmr_rerank's pluggable shortlist (r6 verdict #4): handing it the
    brute-force top-20 as an explicit shortlist_df must be BIT-IDENTICAL
    to the built-in brute-force path — the MMR rounds are provider-
    agnostic, so swapping in an index-backed shortlist changes only the
    shortlist's own recall, nothing in the re-rank."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    builtin = sorted(
        map(tuple, mmr_rerank(e, q, k=4, shortlist=15).collect())
    )
    plugged = sorted(
        map(
            tuple,
            mmr_rerank(
                e,
                q,
                k=4,
                shortlist_df=brute_force_topk(e, q, k=15).select(
                    "query_id", "cand_id", "cosine_sim"
                ),
            ).collect(),
        )
    )
    assert builtin == plugged and builtin


def test_mmr_over_packed_pq_equals_mmr_over_pq_topk(spark, sf_dir):
    """The bench twin's composition (pq_search_packed shortlist) equals
    the scored query's (pq_topk shortlist) — the two PQ search paths are
    already pinned bit-identical, so MMR over them must be too; this
    pins the COMPOSITION end-to-end (corpus never brute-force scanned
    in either)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators import similarity as S
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.dedup import _persist
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.vectors import MMR_LAM

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    via_topk = sorted(
        map(
            tuple,
            S.mmr_rerank(
                e, q, k=4, lam=MMR_LAM,
                shortlist_df=S.pq_topk(e, q, k=15).select(
                    "query_id", "cand_id", "cosine_sim"
                ),
            ).collect(),
        )
    )
    subs = _persist(S._subvectors(e, 16, "vec_id", "embedding"))
    cb = _persist(S.pq_train_codebooks(e, subs=subs))
    codes = S.pq_encode(e, cb, subs=subs)
    cb_rows = [tuple(r) for r in cb.select("m", "code_id", "code_vec").collect()]
    packed = _persist(S.pq_pack_codes(codes, cb_rows))
    via_packed = sorted(
        map(
            tuple,
            S.mmr_rerank(
                e, q, k=4, lam=MMR_LAM,
                shortlist_df=S.pq_search_packed(
                    e, q, cb_rows, packed, k=15
                ).select("query_id", "cand_id", "cosine_sim"),
            ).collect(),
        )
    )
    for df in (subs, cb, packed):
        df.unpersist()
    assert via_topk == via_packed and via_topk


def test_phrase_indexed_path_identical_to_direct(spark, sf_dir):
    """phrase_build_index + phrase_search_indexed vs the direct
    phrase_topk (r6 verdict #5): row-identical on the same corpus —
    same bm25 build-once/search-many proof shape. Also pins the
    uncovered-length guard (silent empties are the failure mode)."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        phrase_build_index,
        phrase_search_indexed,
        phrase_topk,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        PHRASE_QUERIES,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pq = spark.createDataFrame(
        list(PHRASE_QUERIES), "query_id long, phrase string"
    )
    direct = sorted(map(tuple, phrase_topk(docs, pq, k=10).collect()))
    postings = phrase_build_index(docs, lengths=(2, 3))
    indexed = sorted(
        map(tuple, phrase_search_indexed(postings, pq, k=10).collect())
    )
    assert direct == indexed and direct
    # postings carry the phrase length for coverage checks
    assert sorted(
        r.n for r in postings.select("n").distinct().collect()
    ) == [2, 3]

    four = spark.createDataFrame(
        [(9, "a b c d")], "query_id long, phrase string"
    )
    with pytest.raises(ValueError, match="lengths"):
        phrase_search_indexed(postings, four, k=10)


def test_phrase_guards_are_loud(spark, sf_dir):
    """Three inputs that previously crashed opaquely or silently
    returned empty: an empty phrases frame (IndexError in the length
    probe), a NULL phrase (AttributeError on .split), and an indexed
    search whose query length the STORE never materialized (the old
    guard trusted the caller's `lengths` claim — exactly the mistake
    it existed to catch)."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        phrase_build_index,
        phrase_search_indexed,
        phrase_topk,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    empty = spark.createDataFrame([], "query_id long, phrase string")
    with pytest.raises(ValueError, match="empty"):
        phrase_topk(docs, empty)
    withnull = spark.createDataFrame(
        [(0, "hash join"), (1, None)], "query_id long, phrase string"
    )
    with pytest.raises(ValueError, match="NULL phrase.*1"):
        phrase_topk(docs, withnull)

    postings = phrase_build_index(docs, lengths=(2,))
    three = spark.createDataFrame(
        [(0, "hash join scan")], "query_id long, phrase string"
    )
    # Derived from the STORE (no caller claim to mislead it): the
    # 2-gram-only store cannot serve a 3-gram query.
    with pytest.raises(ValueError, match="not in the index"):
        phrase_search_indexed(postings, three)
    # And a WRONG stored_lengths claim passed as metadata is trusted
    # as documented — but here the honest value also refuses:
    with pytest.raises(ValueError, match="not in the index"):
        phrase_search_indexed(postings, three, stored_lengths=(2,))


def test_phrase_queries_are_canonicalized(spark, sf_dir):
    """'Hash Join' and 'hash  join' (case / multi-space) must match the
    same documents as the canonical 'hash join' — grams come from the
    lowercased single-space tokenization, so an unnormalized query
    previously matched NOTHING, silently. Whitespace-only phrases
    raise (zero tokens — no gram length to probe)."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        phrase_build_index,
        phrase_search_indexed,
        phrase_topk,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    canon = spark.createDataFrame(
        [(0, "hash join")], "query_id long, phrase string"
    )
    messy = spark.createDataFrame(
        [(0, "  Hash  JOIN ")], "query_id long, phrase string"
    )
    want = sorted(map(tuple, phrase_topk(docs, canon, k=10).collect()))
    assert want, "fixture phrase must hit something for this test to bite"
    assert sorted(map(tuple, phrase_topk(docs, messy, k=10).collect())) == want
    postings = phrase_build_index(docs, lengths=(2,))
    got_idx = sorted(
        map(tuple, phrase_search_indexed(postings, messy, k=10).collect())
    )
    assert got_idx == want

    blank = spark.createDataFrame(
        [(0, "hash join"), (1, "   ")], "query_id long, phrase string"
    )
    with pytest.raises(ValueError, match="empty/whitespace-only.*1"):
        phrase_topk(docs, blank)


def test_mmr_local_identical_to_distributed(spark, sf_dir):
    """mmr_rerank_local (the driver-side interactive latency twin) is
    BIT-IDENTICAL to the distributed mmr_rerank on the same shortlist:
    the Python greedy loop mirrors the left-to-right IEEE dot fold, the
    lam/(1-lam) literal arithmetic, and the (mmr DESC, cand_id ASC)
    tie-break exactly — same contract pq_search_packed holds vs the
    join path. Compared as exact tuples, no tolerance."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
        mmr_rerank_local,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 6)
    short = brute_force_topk(e, q, k=15).select(
        "query_id", "cand_id", "cosine_sim"
    )
    dist = sorted(
        map(tuple, mmr_rerank(e, q, k=4, shortlist_df=short).collect())
    )
    local = sorted(map(tuple, mmr_rerank_local(e, short, k=4).collect()))
    assert dist == local and dist


def test_mmr_local_budget_enforced(spark, sf_dir):
    """The 65,536-row collect budget is a loud ValueError naming the
    distributed path, not a silent driver stall."""
    import pytest

    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        mmr_rerank_local,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # A synthetic over-budget shortlist: cross every corpus id with
    # enough query ids to exceed the budget without collecting vectors.
    n = e.count()
    import math

    n_q = math.ceil(65_537 / n)
    short = (
        e.selectExpr("vec_id AS cand_id", "0.5 AS cosine_sim")
        .crossJoin(
            spark.range(n_q).selectExpr("id AS query_id")
        )
        .select("query_id", "cand_id", "cosine_sim")
    )
    with pytest.raises(ValueError, match="mmr_rerank_local.*budget"):
        mmr_rerank_local(e, short, k=4)


def test_ranking_metrics_composes_with_rrf_and_empty_pool(spark, sf_dir):
    """ranking_metrics accepts any (query_id, cand_id, rank) provider —
    here the RRF-fused hybrid list — and a query with an EMPTY
    relevance pool reports zero metrics, not NULLs (the left-join +
    idcg-gate path)."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        brute_force_topk,
        ranking_metrics,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.text import (
        bm25_topk,
        rrf_fuse,
    )
    from cig_etl_s3_to_sql_data_ingestor_spark.queries.mining import (
        BM25_QUERY_TERMS,
    )

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    terms = spark.createDataFrame(
        list(BM25_QUERY_TERMS), "query_id long, term string"
    )
    qids = sorted({q for q, _ in BM25_QUERY_TERMS})
    queries = e.filter(F.col("vec_id").isin(qids))
    fused = rrf_fuse(
        bm25_topk(d, terms, k=10).select(
            "query_id", F.col("doc_id").alias("cand_id"), "rank"
        ),
        brute_force_topk(e, queries, k=10).select(
            "query_id", "cand_id", "rank"
        ),
        k=10,
    ).select("query_id", "cand_id", "rank")
    # Relevance pool: same-label pairs for queries 0-2; query 3 gets an
    # EMPTY pool on purpose.
    ql = queries.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("ql")
    )
    cl = e.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cl"))
    pool = (
        ql.crossJoin(cl)
        .filter((F.col("ql") == F.col("cl")) & (F.col("cand_id") != F.col("query_id")))
        .select("query_id", "cand_id")
    )
    out = {r["query_id"]: r for r in ranking_metrics(fused, pool, k=10).collect()}
    assert set(out) == set(qids)
    empty = out[3]
    assert (
        empty["n_relevant_pool"],
        empty["hits_at_k"],
        empty["mrr"],
        empty["dcg"],
        empty["idcg"],
        empty["ndcg"],
    ) == (0, 0, 0.0, 0.0, 0.0, 0.0)
    for qid in (0, 1, 2):
        r = out[qid]
        assert r["n_relevant_pool"] > 0
        assert 0.0 <= r["ndcg"] <= 1.0
        assert r["precision_at_k"] == r["hits_at_k"] / 10.0


def test_ranking_metrics_clamps_deep_provider_and_explicit_queries(
    spark, sf_dir
):
    """A provider list DEEPER than k (a k=20 ANN shortlist evaluated at
    k=10) is clamped at entry: no out-of-range gain lookup (ANSI
    abort), precision@k never exceeds 1, and the result is identical to
    handing in the pre-truncated top-10. An explicit ``queries`` frame
    surfaces zero-result queries as all-zero rows instead of dropping
    them from the evaluation."""
    from cig_etl_s3_to_sql_data_ingestor_spark.io import load_table
    from cig_etl_s3_to_sql_data_ingestor_spark.operators.similarity import (
        brute_force_topk,
        ranking_metrics,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    deep = brute_force_topk(e, q, k=20).select("query_id", "cand_id", "rank")
    ql = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
    cl = e.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cl"))
    pool = (
        ql.crossJoin(cl)
        .filter((F.col("ql") == F.col("cl")) & (F.col("cand_id") != F.col("query_id")))
        .select("query_id", "cand_id")
    )
    got = {
        r["query_id"]: r
        for r in ranking_metrics(deep, pool, k=10).collect()
    }
    want = {
        r["query_id"]: r
        for r in ranking_metrics(
            deep.filter(F.col("rank") <= 10), pool, k=10
        ).collect()
    }
    assert set(got) == set(want) == {0, 1, 2, 3}
    for qid, r in got.items():
        assert 0.0 <= r["precision_at_k"] <= 1.0
        assert r == want[qid]

    # Zero-result query: universe says {0..4}, provider returned rows
    # only for {0..3} — query 4 must appear with all-zero metrics.
    universe = spark.range(5).selectExpr("id AS query_id")
    out = {
        r["query_id"]: r
        for r in ranking_metrics(deep, pool, k=10, queries=universe).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    ghost = out[4]
    assert (
        ghost["hits_at_k"],
        ghost["precision_at_k"],
        ghost["mrr"],
        ghost["dcg"],
        ghost["ndcg"],
    ) == (0, 0.0, 0.0, 0.0, 0.0)
