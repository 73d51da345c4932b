"""Similarity-search query surface over ``embeddings``.

The oracle computes dot products with the same left-to-right fold the
Spark operators use (list_reduce starting at element 1 == fold from 0.0,
since 0.0 + x == x in IEEE double), so cosine scores are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import similarity as S

QUERIES = {}
ORACLES = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _sql_cosine(a: str, b: str) -> str:
    return f"{_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"


@register(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id, sqrt({_sql_dot('embedding', 'embedding')}) AS l2_norm
    FROM embeddings ORDER BY vec_id
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return S.l2_norms(e).orderBy("vec_id")


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    scored AS (
      SELECT q.query_id, c.cand_id,
             {_sql_cosine('q.query_vec', 'c.cand_vec')} AS cosine_sim
      FROM c CROSS JOIN q WHERE c.cand_id <> q.query_id
    )
    SELECT query_id, cand_id, cosine_sim, rank FROM (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.brute_force_topk(e, queries, k=10).orderBy("query_id", "rank")


def _sql_band_sig(v: str, dims: tuple[int, ...], idx: int) -> str:
    bits = " || ".join(
        f"(CASE WHEN {v}[{d}] >= 0 THEN '1' ELSE '0' END)" for d in dims
    )
    return f"('{idx}:' || {bits})"


def _sql_band_buckets(v: str, bands: int = 21, band_bits: int = 3) -> str:
    """List of per-band bucket keys mirroring similarity.sign_band_buckets."""
    from ..operators.similarity import band_dims

    sigs = ", ".join(
        _sql_band_sig(v, dims, i) for i, dims in enumerate(band_dims(bands, band_bits))
    )
    return f"[{sigs}]"


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH cb AS (
      SELECT vec_id AS cand_id,
             unnest({_sql_band_buckets('embedding')}) AS bucket
      FROM embeddings
    ),
    qb AS (
      SELECT vec_id AS query_id,
             unnest({_sql_band_buckets('embedding')}) AS bucket
      FROM embeddings WHERE vec_id < 8
    ),
    pairs AS (
      SELECT DISTINCT qb.query_id, cb.cand_id
      FROM cb JOIN qb USING (bucket) WHERE cb.cand_id <> qb.query_id
    ),
    scored AS (
      SELECT p.query_id, p.cand_id,
             {_sql_cosine('q.embedding', 'c.embedding')} AS cosine_sim
      FROM pairs p
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings c ON c.vec_id = p.cand_id
    )
    SELECT query_id, cand_id, cosine_sim, rank FROM (
      SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH top-k (OR-amplified: candidate = shares ANY of 21
    3-bit sign bands with the query). The one-band form measured
    recall@10 = 0.12; the banded default measures 0.99
    (tests/test_ann_recall.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.axis_lsh_topk(e, queries, k=5).orderBy("query_id", "rank")


def _sql_hash_bucket(id_expr: str, mod: int) -> str:
    """Version-stable md5 bucket of an ID expression — the canonical
    spelling lives in functions.hashing.sql_md5_mod; this wrapper adds
    only the VARCHAR cast for non-string ids."""
    from ..functions.hashing import sql_md5_mod

    return sql_md5_mod(f"CAST({id_expr} AS VARCHAR)", mod)


def _sql_kmeans_ctes(
    n_cells: int | str = 16,
    n_iters: int = 2,
    quant: int = 1_000_000,
    sample_mod: int | None = None,
    init_from: str = "embeddings",
) -> str:
    """CTE chain reproducing operators.similarity.kmeans_centroids exactly:
    sorted init, per-iteration nearest-cell assign (cosine DESC, cell_id
    DESC tie-break), and the quantized-integer mean update (integer sums
    are order-independent, so both engines compute identical centroids).
    With ``sample_mod`` the mean updates see only the deterministic
    md5-bucket sample, mirroring the operator's training sample.
    ``init_from`` overrides the init source (a table or parenthesized
    subquery) when the corpus is a subset of ``embeddings`` — the
    operator seeds with the corpus's ``n_cells`` TRUE lowest ids (an
    ORDER BY + LIMIT, not an id-value predicate, so a re-keyed or
    subset corpus still seeds the full cell count), and the mirror must
    apply the identical selection to the identical subset."""
    train = "c"
    ctes = [
        # n_cells may be a parenthesized scalar subquery (DuckDB allows
        # LIMIT (SELECT ...)) for corpus-derived cell counts — the
        # n_cells ~ sqrt(corpus) deployment dial the *_cells scale
        # paths use; the Spark side computes the identical value via
        # isqrt on the exact count (a correctly-rounded double sqrt of
        # an exact integer floors to the same value).
        f"cent0 AS (SELECT vec_id AS cell_id, embedding AS cell_vec "
        f"FROM {init_from} ORDER BY vec_id LIMIT {n_cells})"
    ]
    if sample_mod is not None:
        train = "train"
        ctes.append(
            f"train AS (SELECT * FROM c WHERE {_sql_hash_bucket('cand_id', sample_mod)} = 0)"
        )
    for it in range(n_iters):
        prev, cur = f"cent{it}", f"cent{it + 1}"
        ctes.append(
            f"""assign{it} AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT {train}.cand_id, {train}.cand_vec, {prev}.cell_id,
               ROW_NUMBER() OVER (PARTITION BY {train}.cand_id
                                  ORDER BY {_sql_cosine(f'{train}.cand_vec', f'{prev}.cell_vec')} DESC,
                                           {prev}.cell_id DESC) AS rn
        FROM {train} CROSS JOIN {prev}
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""sums{it} AS (
      SELECT cell_id,
             unnest(generate_series(1, len(cand_vec))) AS pos,
             unnest(list_transform(generate_series(1, len(cand_vec)),
                    i -> CAST(floor(CAST(cand_vec[i] AS DOUBLE) * {quant}) AS BIGINT))) AS q
      FROM assign{it}
    )"""
        )
        ctes.append(
            f"""{cur} AS (
      SELECT cell_id,
             list((CAST(s AS DOUBLE) / n) / {quant}.0 ORDER BY pos) AS cell_vec
      FROM (SELECT cell_id, pos, SUM(q) AS s, COUNT(*) AS n
            FROM sums{it} GROUP BY cell_id, pos)
      GROUP BY cell_id
    )"""
        )
    ctes.append(f"cent AS (SELECT * FROM cent{n_iters})")
    return ",\n    ".join(ctes)


def _sql_ivf_search(
    n_probe: int = 12, k: int = 5, as_cte: str | None = None
) -> str:
    """IVF search tail shared by every IVF-family oracle: nearest-cell
    corpus assignment, n_probe query probes, probed-cell scoring, and the
    (cosine DESC, cand_id) top-k rank — one spelling of the tie-breaks
    and constants, so the mirrors cannot diverge. Expects CTEs ``c``
    (cand_id, cand_vec), ``q`` (query_id, query_vec) and ``cent``.
    With ``as_cte`` the top-k becomes a named CTE (no ORDER BY) so a
    caller can hang its own tail — e.g. the kNN vote/accuracy chain —
    off the identical search text."""
    ranked = f"""SELECT query_id, cand_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored"""
    if as_cte is not None:
        tail = f""",
    {as_cte} AS (
      SELECT query_id, cand_id, cosine_sim, rank FROM (
      {ranked}
      ) WHERE rank <= {k}
    )"""
    else:
        tail = f"""
    SELECT query_id, cand_id, cosine_sim, rank FROM (
      {ranked}
    ) WHERE rank <= {k} ORDER BY query_id, rank"""
    return f"""assigned AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT c.cand_id, c.cand_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, query_vec, cell_id FROM (
        SELECT q.query_id, q.query_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cosine('q.query_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT p.query_id, a.cand_id,
             {_sql_cosine('p.query_vec', 'a.cand_vec')} AS cosine_sim
      FROM assigned a JOIN probes p USING (cell_id)
      WHERE a.cand_id <> p.query_id
    ){tail}"""


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=4)},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 8),
    {_sql_ivf_search(n_probe=12, k=5)}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat top-k at the measured-recall default n_probe=12/16
    (recall@10 = 0.93 vs brute force; 4 probes measured 0.56 — curve in
    tests/test_ann_recall.py and the operator docstring)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    # Training runs on the deterministic 1/4 md5-bucket sample (mirrored
    # in the oracle's `train` CTE) — the 100 TB pattern where the sample,
    # not the corpus, bounds KMeans-assign cost.
    return S.ivf_topk(
        e, queries, k=5, n_cells=16, n_probe=12, kmeans_sample_mod=4
    ).orderBy("query_id", "rank")


@register(
    "embedding_clusters",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=2)},
    assigned AS (
      SELECT cand_id, cell_id FROM (
        SELECT c.cand_id, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    counts AS (
      SELECT a.cell_id, e.label, COUNT(*) AS cnt
      FROM assigned a JOIN embeddings e ON a.cand_id = e.vec_id
      GROUP BY a.cell_id, e.label
    ),
    agg AS (
      SELECT cell_id, CAST(SUM(cnt) AS BIGINT) AS n_vecs,
             COUNT(*) AS n_labels, MAX(cnt) AS majority_cnt
      FROM counts GROUP BY cell_id
    ),
    maj AS (
      SELECT cell_id, label AS majority_label FROM (
        SELECT cell_id, label,
               ROW_NUMBER() OVER (PARTITION BY cell_id
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM counts
      ) WHERE rn = 1
    )
    SELECT cell_id, n_vecs, n_labels, majority_label, majority_cnt
    FROM agg JOIN maj USING (cell_id) ORDER BY cell_id
    """,
)
def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering summary (the SemDeDup/cluster-curation view):
    deterministic KMeans trained on the 1/2 md5-bucket sample, every
    vector assigned to its nearest centroid map-side, then per-cluster
    size, label diversity, and majority ground-truth label."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = S.kmeans_centroids(e, n_cells=16, n_iters=2, sample_mod=2).select(
        F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding")
    )
    assigned = S.ivf_assign(e, cent, n_probe=1).select("cand_id", "cell_id")
    counts = (
        assigned.join(e.select(F.col("vec_id").alias("cand_id"), "label"), "cand_id")
        .groupBy("cell_id", "label")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.groupBy("cell_id")
        .agg(
            F.sum("cnt").alias("n_vecs"),
            F.count("*").alias("n_labels"),
            F.max_by(F.col("label"), F.struct(F.col("cnt"), -F.col("label"))).alias(
                "majority_label"
            ),
            F.max("cnt").alias("majority_cnt"),
        )
        .orderBy("cell_id")
    )


@register(
    "embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cosine('a.embedding', 'b.embedding')} AS cosine_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= 0.4
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Threshold 0.4: the synthetic embeddings are near-uniform (max
    # within-label cosine ~0.47 at sf0.01), so a conventional 0.9 cutoff
    # would make this a vacuous always-empty check.
    e = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_duplicates(e, block_col="label", threshold=0.4).orderBy(
        "id_a", "id_b"
    )


_B16 = _sql_hash_bucket("vec_id", 16)


@register(
    "ann_incremental",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding, {_B16} AS b FROM embeddings),
    c AS (SELECT vec_id AS cand_id, embedding AS cand_vec
          FROM base WHERE b <> 0),
    {_sql_kmeans_ctes(sample_mod=4, init_from="(SELECT vec_id, embedding FROM base WHERE b <> 0)")},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec
          FROM base WHERE b = 0),
    {_sql_ivf_search(n_probe=12, k=5)}
    """,
)
def ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance: a new crawl batch (the ~1/16
    md5-bucket of embeddings) is ANN-joined against the EXISTING corpus
    using centroids trained on that corpus alone — no retraining on
    arrival, no corpus reshuffle (the mirror of dedup_incremental's
    signature-store pattern, for vectors).

    At 100 TB this is the steady-state ingest path: centroids live in a
    persisted index table (here retrained deterministically because the
    fixture has no cross-run storage), each arriving batch is assigned
    map-side against the broadcast centroids, probed against its
    n_probe best cells, and only those cells' members are re-ranked.

    Scale note: the ORACLE pins 16 cells / 12 probes, so this scored
    form is O(batch x corpus / 16) — quadratic by semantics with both
    sides growing (the 10x rehearsal measures ~11-13x wall across
    sweeps, same class as embedding_neardup / knn_label_eval). The
    deployment dial is n_cells ~ sqrt(corpus) with n_probe fixed —
    coded and benched per-round as `ann_incremental_cells` (bench.py;
    measured 2.3x at 10x rows, scaling_sweep.json `scale_paths`)."""
    from ..functions.hashing import md5_bucket

    e = load_table(spark, sf_dir, "embeddings")
    bucket = md5_bucket(F.col("vec_id"), 16)
    corpus = e.filter(bucket != 0)
    batch = e.filter(bucket == 0)
    cent = S.kmeans_centroids(corpus, n_cells=16, n_iters=2, sample_mod=4).select(
        F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding")
    )
    return S.ivf_topk(
        corpus, batch, k=5, n_cells=16, n_probe=12, centroids=cent
    ).orderBy("query_id", "rank")


@register(
    "knn_label_eval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS query_vec, label AS true_label
      FROM embeddings WHERE vec_id % 5 = 0
    ),
    scored AS (
      SELECT q.query_id, q.true_label, c.label AS cand_label,
             {_sql_cosine('q.query_vec', 'c.embedding')} AS cosine_sim,
             c.vec_id AS cand_id
      FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, true_label, cand_label FROM (
        SELECT query_id, true_label, cand_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, cand_id) AS rank
        FROM scored
      ) WHERE rank <= 10
    ),
    votes AS (
      SELECT query_id, true_label, cand_label, COUNT(*) AS n_votes
      FROM topk GROUP BY query_id, true_label, cand_label
    ),
    pred AS (
      SELECT query_id, true_label, cand_label AS predicted FROM (
        SELECT query_id, true_label, cand_label, n_votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, cand_label) AS vr
        FROM votes
      ) WHERE vr = 1
    )
    SELECT CAST(true_label AS INTEGER) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy
    FROM pred GROUP BY true_label ORDER BY label
    """,
)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality evaluation: k-NN (k=10, cosine) majority-vote
    label prediction accuracy per true label — the standard "are these
    embeddings any good" probe a training-data pipeline runs before
    trusting them for clustering / near-dup / retrieval decisions.

    Reuses the proven ``brute_force_topk`` kernel (broadcast query set;
    the corpus side never shuffles), so the heavy stage is identical to
    ``ann_cosine_topk``; everything after the top-k is bounded by
    (#queries x k) rows. Majority ties break on the smaller label in
    both engines. At 100 TB the same evaluation runs over an ANN top-k
    (ivf/lsh) instead of brute force — accuracy then degrades by exactly
    the measured recall gap (tests/test_ann_recall.py).
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 5 == 0)
    topk = S.brute_force_topk(e, q, k=10)
    labels = e.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")
    )
    truth = q.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = (
        topk.join(labels, "cand_id")
        .join(F.broadcast(truth), "query_id")
        .groupBy("query_id", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("cand_label")
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("cand_label").alias("predicted"))
    )
    correct = F.when(F.col("predicted") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(correct).alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            (F.col("n_correct").cast("double") / F.col("n_queries")).alias(
                "accuracy"
            ),
        )
        .orderBy("label")
    )


def _sql_l2sq(a: str, b: str) -> str:
    """Ordered squared-L2 fold mirroring functions.vectors.l2sq (the
    0.0-init fold equals DuckDB's first-element start since 0.0 + x == x
    in IEEE double)."""
    d = f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> {d} * {d}), (x, y) -> x + y)"
    )


def _sql_pq_ctes(
    n_sub: int = 16,
    n_codes: int = 16,
    n_iters: int = 2,
    quant: int = 1_000_000,
    dist_quant: int = 1_000_000_000,
    k: int = 5,
    shortlist_factor: int = 8,
    prefix: str = "",
    candidates: str | None = None,
    tail_cte: str | None = None,
) -> str:
    """CTE chain reproducing operators.similarity.pq_topk exactly:
    grouped per-subspace KMeans (sorted init, ordered L2 folds,
    quantized-integer means, ties toward the LOWEST code id), PQ
    encoding, the integer-quantized ADC scan, and the shortlist + exact
    cosine re-rank. Expects CTEs ``c`` (cand_id, cand_vec) and ``q``
    (query_id, query_vec).

    ``prefix`` namespaces every internal CTE so the chain can compose
    with the KMeans CTEs (which also emit assign{i}/sums{i} names) in
    one statement; ``candidates`` names a (query_id, cand_id) CTE that
    restricts the ADC scan to IVF-probed pairs — the ivf_pq_topk
    mirror."""

    def N(name: str) -> str:
        return f"{prefix}{name}"

    sl = f"(len(cand_vec) // {n_sub})"
    qsl = f"(len(query_vec) // {n_sub})"
    ctes = [
        f"""{N("subs")} AS (
      SELECT cand_id AS sid, ms.m,
             list_slice(cand_vec, ms.m * {sl} + 1, (ms.m + 1) * {sl}) AS sub
      FROM c CROSS JOIN (SELECT unnest(generate_series(0, {n_sub - 1})) AS m) ms
    )""",
        f"""{N("cb0")} AS (
      SELECT m, sid AS code_id, sub AS code_vec FROM {N("subs")}
      WHERE sid IN (SELECT DISTINCT sid FROM {N("subs")} ORDER BY sid LIMIT {n_codes})
    )""",
    ]
    for it in range(n_iters):
        prev, cur = N(f"cb{it}"), N(f"cb{it + 1}")
        ctes.append(
            f"""{N(f"assign{it}")} AS (
      SELECT sid, m, sub, code_id FROM (
        SELECT s.sid, s.m, s.sub, cb.code_id,
               ROW_NUMBER() OVER (PARTITION BY s.sid, s.m
                                  ORDER BY {_sql_l2sq("s.sub", "cb.code_vec")} ASC,
                                           cb.code_id ASC) AS rn
        FROM {N("subs")} s JOIN {prev} cb USING (m)
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""{N(f"sums{it}")} AS (
      SELECT m, code_id,
             unnest(generate_series(1, len(sub))) AS pos,
             unnest(list_transform(generate_series(1, len(sub)),
                    i -> CAST(floor(CAST(sub[i] AS DOUBLE) * {quant}) AS BIGINT))) AS q
      FROM {N(f"assign{it}")}
    )"""
        )
        ctes.append(
            f"""{cur} AS (
      SELECT m, code_id,
             list((CAST(s AS DOUBLE) / n) / {quant}.0 ORDER BY pos) AS code_vec
      FROM (SELECT m, code_id, pos, SUM(q) AS s, COUNT(*) AS n
            FROM {N(f"sums{it}")} GROUP BY m, code_id, pos)
      GROUP BY m, code_id
    )"""
        )
    ctes.append(f"{N('cb')} AS (SELECT * FROM {N(f'cb{n_iters}')})")
    ctes.append(
        f"""{N("codes")} AS (
      SELECT sid AS cand_id, m, code_id FROM (
        SELECT s.sid, s.m, cb.code_id,
               ROW_NUMBER() OVER (PARTITION BY s.sid, s.m
                                  ORDER BY {_sql_l2sq("s.sub", "cb.code_vec")} ASC,
                                           cb.code_id ASC) AS rn
        FROM {N("subs")} s JOIN {N("cb")} cb USING (m)
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""{N("qsubs")} AS (
      SELECT query_id, ms.m,
             list_slice(query_vec, ms.m * {qsl} + 1, (ms.m + 1) * {qsl}) AS sub
      FROM q CROSS JOIN (SELECT unnest(generate_series(0, {n_sub - 1})) AS m) ms
    )""",
    )
    ctes.append(
        f"""{N("dtab")} AS (
      SELECT qs.query_id, qs.m, cb.code_id,
             CAST(floor({_sql_l2sq("qs.sub", "cb.code_vec")} * {dist_quant})
                  AS BIGINT) AS qd2
      FROM {N("qsubs")} qs JOIN {N("cb")} cb USING (m)
    )"""
    )
    if candidates is None:
        ctes.append(
            f"""{N("adc")} AS (
      SELECT d.query_id, co.cand_id, SUM(d.qd2) AS adc_q
      FROM {N("codes")} co JOIN {N("dtab")} d USING (m, code_id)
      WHERE co.cand_id <> d.query_id
      GROUP BY d.query_id, co.cand_id
    )"""
        )
    else:
        ctes.append(
            f"""{N("adc")} AS (
      SELECT cp.query_id, cp.cand_id, SUM(d.qd2) AS adc_q
      FROM {candidates} cp
      JOIN {N("codes")} co ON co.cand_id = cp.cand_id
      JOIN {N("dtab")} d ON d.query_id = cp.query_id
                        AND d.m = co.m AND d.code_id = co.code_id
      GROUP BY cp.query_id, cp.cand_id
    )"""
        )
    ctes.append(
        f"""{N("short")} AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_q ASC, cand_id ASC) AS ar
        FROM {N("adc")}
      ) WHERE ar <= {k * shortlist_factor}
    )"""
    )
    tail_body = f"""SELECT query_id, cand_id, cosine_sim, rank FROM (
      SELECT s.query_id, s.cand_id,
             {_sql_cosine("q.query_vec", "c.cand_vec")} AS cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY s.query_id
                                ORDER BY {_sql_cosine("q.query_vec", "c.cand_vec")} DESC,
                                         s.cand_id ASC) AS rank
      FROM {N("short")} s
      JOIN q ON q.query_id = s.query_id
      JOIN c ON c.cand_id = s.cand_id
    ) WHERE rank <= {k}"""
    if tail_cte is not None:
        # Composition form: the exact-re-ranked PQ top-k becomes a named
        # CTE (e.g. the MMR chain's shortlist source) instead of the
        # statement's final SELECT. MATERIALIZED: the consumer (MMR's
        # unrolled rounds) references it many times, and DuckDB would
        # otherwise re-inline the whole KMeans+ADC chain per reference
        # (measured >120 s at sf0.01 vs seconds materialized).
        ctes.append(f"{tail_cte} AS MATERIALIZED (\n      {tail_body}\n    )")
        return ",\n    ".join(ctes)
    return ",\n    ".join(ctes) + "\n    " + tail_body + " ORDER BY query_id, rank"


@register(
    "ann_pq_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 8),
    {_sql_pq_ctes()}
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k with exact shortlist re-rank: the
    memory-compression ANN path (16x16 codebooks shrink a 256 B float32
    vector to 8 B of codes, 32x) complementing IVF's work-bounding path.
    The ADC scan touches only the integer codes; exact math runs only on
    the k x 8 shortlist. Measured recall@10 at the defaults: 0.93 vs
    brute force (curve in the operator docstring and
    tests/test_ann_recall.py). At 100 TB the two compose (IVF cells of
    PQ codes); here PQ runs standalone so its recall is measured in
    isolation."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.pq_topk(e, queries, k=5).orderBy("query_id", "rank")


@register(
    "ann_ivf_pq_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=4)},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 8),
    ivf_assigned AS (
      SELECT cand_id, cell_id FROM (
        SELECT c.cand_id, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    ivf_probes AS (
      SELECT query_id, cell_id FROM (
        SELECT q.query_id, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cosine('q.query_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= 12
    ),
    cand_pairs AS (
      SELECT p.query_id, a.cand_id
      FROM ivf_assigned a JOIN ivf_probes p USING (cell_id)
      WHERE a.cand_id <> p.query_id
    ),
    {_sql_pq_ctes(prefix='pq_', candidates='cand_pairs')}
    """,
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the billion-vector deployment shape: probed
    cells bound the WORK, 8-byte PQ codes bound the BYTES, exact math
    only on the shortlist. Trained parts are the same deterministic
    kernels the standalone queries prove (sampled-KMeans centroids,
    grouped PQ codebooks), so the mirror rebuilds the identical index
    end-to-end. Measured recall@10 at the defaults in
    tests/test_ann_recall.py — the IVF probe miss and PQ shortlist miss
    compose roughly multiplicatively."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.ivf_pq_topk(e, queries, k=5, kmeans_sample_mod=4).orderBy(
        "query_id", "rank"
    )


SEMDEDUP_THRESHOLD = 0.33  # within-cell cosine: ~p99 of the synthetic
# within-cell pair distribution at sf0.01 (max ~0.49), so decisions are
# non-degenerate — ~23% of vectors evicted, 77% kept.


@register(
    "semdedup_keep",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=2)},
    assigned AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT c.cand_id, c.cand_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    sims AS (
      SELECT a.cand_id, a.cand_vec, a.cell_id,
             {_sql_cosine('a.cand_vec', 'cent.cell_vec')} AS centroid_sim
      FROM assigned a JOIN cent ON a.cell_id = cent.cell_id
    ),
    pairs AS (
      SELECT b.cand_id AS id_b, a.cand_id AS id_a, a.centroid_sim AS sim_a
      FROM sims a JOIN sims b ON a.cell_id = b.cell_id
       AND (a.centroid_sim > b.centroid_sim
            OR (a.centroid_sim = b.centroid_sim AND a.cand_id < b.cand_id))
      WHERE {_sql_cosine('a.cand_vec', 'b.cand_vec')} >= {SEMDEDUP_THRESHOLD}
    ),
    killers AS (
      SELECT id_b, id_a AS dup_of FROM (
        SELECT id_b, id_a,
               ROW_NUMBER() OVER (PARTITION BY id_b
                                  ORDER BY sim_a DESC, id_a ASC) AS rn
        FROM pairs
      ) WHERE rn = 1
    )
    SELECT s.cand_id AS vec_id, s.cell_id, s.centroid_sim,
           CAST(CASE WHEN k.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
           k.dup_of
    FROM sims s LEFT JOIN killers k ON s.cand_id = k.id_b
    ORDER BY vec_id
    """,
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop decisions (Abbas et al. 2023): cluster with
    the deterministic sampled KMeans, evict any vector cosine-similar
    (>= 0.33) to a higher-ranked member of its cell — rank = closeness
    to the centroid, so each tight semantic group keeps its most central
    representative. Complements embedding_neardup (pairs, fixed blocks)
    and embedding_clusters (summaries) with per-vector curation
    DECISIONS — the frame a training-data pipeline anti-joins against
    the corpus. Cell-blocked self-join: O(n) candidate pairs at
    n_cells ~ sqrt(n) (see operators/similarity.semdedup_decisions)."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.semdedup_decisions(
        e, n_cells=16, n_iters=2, threshold=SEMDEDUP_THRESHOLD, sample_mod=2
    ).orderBy("vec_id")


def _sql_mmr_ctes(
    k: int,
    shortlist: int,
    lam_num: str,
    one_minus_lam: str,
    shortlist_from: str | None = None,
) -> str:
    """Unrolled MMR CTE chain mirroring operators.similarity.mmr_rerank
    step for step: exact shortlist, pure-relevance step 1, then k-1
    rounds of remaining-vs-selected max-sim folds and (mmr DESC,
    cand_id) winners. ``lam``/``1-lam`` are passed as SQL literals the
    caller guarantees parse to the exact doubles the Spark side uses
    (0.75/0.25 — exact binary fractions).

    ``shortlist_from`` mirrors mmr_rerank's pluggable ``shortlist_df``:
    a (query_id, cand_id, cosine_sim) CTE (e.g. the PQ tail) replaces
    the brute-force scored/short pair; ``shortlist`` is then unused —
    the provider already bounded the list."""
    if shortlist_from is not None:
        # MATERIALIZED for the same reason as the PQ tail: every MMR
        # round references short twice (remaining + vector fetch).
        ctes = [
            f"""short AS MATERIALIZED (
      SELECT p.query_id, p.cand_id, p.cosine_sim AS rel, c.cand_vec
      FROM {shortlist_from} p JOIN c ON c.cand_id = p.cand_id
    )""",
        ]
    else:
        ctes = [
            f"""scored AS (
      SELECT q.query_id, c.cand_id,
             {_sql_cosine('q.query_vec', 'c.cand_vec')} AS rel, c.cand_vec
      FROM c CROSS JOIN q WHERE c.cand_id <> q.query_id
    )""",
            f"""short AS (
      SELECT query_id, cand_id, rel, cand_vec FROM (
        SELECT query_id, cand_id, rel, cand_vec,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rnk
        FROM scored
      ) WHERE rnk <= {shortlist}
    )""",
        ]
    ctes.append(
        """acc1 AS (
      SELECT query_id, cand_id, rel AS mmr_score, CAST(1 AS BIGINT) AS rank,
             cand_vec
      FROM (
        SELECT query_id, cand_id, rel, cand_vec,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id) AS rn
        FROM short
      ) WHERE rn = 1
    )"""
    )
    for i in range(2, k + 1):
        prev = f"acc{i - 1}"
        ctes.append(
            f"""rem{i} AS (
      SELECT s.query_id, s.cand_id, s.rel, s.cand_vec
      FROM short s LEFT JOIN {prev} a
        ON s.query_id = a.query_id AND s.cand_id = a.cand_id
      WHERE a.cand_id IS NULL
    )"""
        )
        ctes.append(
            f"""sims{i} AS (
      SELECT r.query_id, r.cand_id,
             MAX({_sql_cosine('r.cand_vec', 'a.cand_vec')}) AS max_sim,
             MIN(r.rel) AS rel
      FROM rem{i} r JOIN {prev} a ON r.query_id = a.query_id
      GROUP BY r.query_id, r.cand_id
    )"""
        )
        ctes.append(
            f"""pick{i} AS (
      SELECT query_id, cand_id, mmr AS mmr_score FROM (
        SELECT query_id, cand_id, mmr,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY mmr DESC, cand_id) AS rn
        FROM (SELECT query_id, cand_id,
                     {lam_num} * rel - {one_minus_lam} * max_sim AS mmr
              FROM sims{i})
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""acc{i} AS (
      SELECT * FROM {prev}
      UNION ALL
      SELECT p.query_id, p.cand_id, p.mmr_score,
             CAST({i} AS BIGINT) AS rank, s.cand_vec
      FROM pick{i} p JOIN short s
        ON p.query_id = s.query_id AND p.cand_id = s.cand_id
    )"""
        )
    return ",\n    ".join(ctes)


# lam = 0.75 so both lam and 1 - lam are EXACT binary fractions — the
# Spark side computes 1.0 - lam in Python and the oracle parses a
# literal; 0.75/0.25 make those the same double on any engine (0.7/0.3
# would not: 1.0 - 0.7 = 0.30000000000000004 != parsed 0.3).
MMR_LAM = 0.75


@register(
    "ann_mmr_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_mmr_ctes(k=5, shortlist=20, lam_num='0.75', one_minus_lam='0.25')}
    SELECT query_id, cand_id, mmr_score, rank FROM acc5
    ORDER BY query_id, rank
    """,
)
def ann_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 over the exact top-20 shortlist — the
    retrieval-side redundancy control (Carbonell & Goldstein 1998):
    each rank trades relevance against similarity to the already-picked
    set, so a cluster of near-identical candidates yields one result,
    not five. Unrolled provable form (operators/similarity.mmr_rerank);
    per-round work is query-bounded (shortlist x selected), the corpus
    appears only in the exact shortlist pass."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.mmr_rerank(e, queries, k=5, shortlist=20, lam=MMR_LAM).orderBy(
        "query_id", "rank"
    )


@register(
    "ann_mmr_pq",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS query_vec
          FROM embeddings WHERE vec_id < 8),
    {_sql_pq_ctes(k=20, prefix='pq_', tail_cte='pq_out')},
    {_sql_mmr_ctes(k=5, shortlist=20, lam_num='0.75', one_minus_lam='0.25',
                   shortlist_from='pq_out')}
    SELECT query_id, cand_id, mmr_score, rank FROM acc5
    ORDER BY query_id, rank
    """,
)
def ann_mmr_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification composed over the PQ index shortlist (r6
    verdict #4): the deployment shape where the corpus is touched only
    through the compressed-code ADC scan + the shortlist's exact
    re-rank — never a brute-force relevance pass. The MMR rounds are
    provider-agnostic (bit-identical on an identical shortlist, pinned
    by tests/test_ann_recall.py), so the only quality delta vs
    ann_mmr_topk is the PQ shortlist's own recall (0.93@10 at these
    defaults, tests/test_ann_recall.py). The oracle rebuilds the SAME
    index end-to-end (PQ CTE tail as the MMR chain's shortlist CTE) —
    merge of the two proven mirrors. Bench twin ``ann_mmr_pq_search``
    runs this over PREBUILT packed codes via pq_search_packed."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    short = S.pq_topk(e, queries, k=20).select(
        "query_id", "cand_id", "cosine_sim"
    )
    return S.mmr_rerank(
        e, queries, k=5, lam=MMR_LAM, shortlist_df=short
    ).orderBy("query_id", "rank")


_SQ8_DIM = 64

# Shared SQ8 oracle pieces: the stats CTEs (per-dim min + (max-min)/255
# packed into two list columns) and the quantize-then-reconstruct
# expression — ONE spelling for the brute and IVF-composed mirrors so
# the fixed op order (subtract, divide, floor, clamp, add half,
# multiply, add) cannot drift between them.
_SQ8_STATS_CTES = f"""dims AS (SELECT unnest(generate_series(1, {_SQ8_DIM})) AS i),
    stats AS (
      SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
             (max(CAST(embedding[i] AS DOUBLE))
              - min(CAST(embedding[i] AS DOUBLE))) / 255.0 AS sc
      FROM embeddings, dims GROUP BY i
    ),
    packed AS (
      SELECT list(mn ORDER BY i) AS mins, list(sc ORDER BY i) AS scales
      FROM stats
    )"""


def _sql_sq8_recon(src: str) -> str:
    """Midpoint reconstruction of ``src``'s SQ8 codes against the
    ``packed`` stats row (mirrors operators.similarity._sq8_recon_col)."""
    code = (
        f"CASE WHEN scales[i] = 0 THEN 0 ELSE "
        f"CAST(greatest(least(floor((CAST({src}[i] AS DOUBLE) - mins[i])"
        f" / scales[i]), 255.0), 0.0) AS BIGINT) END"
    )
    return (
        f"list_transform(generate_series(1, {_SQ8_DIM}),"
        f" i -> (CAST(({code}) AS DOUBLE) + 0.5) * scales[i] + mins[i])"
    )


@register(
    "ann_sq8_topk",
    oracle=f"""
    WITH {_SQ8_STATS_CTES},
    recon AS (
      SELECT vec_id AS cand_id, {_sql_sq8_recon('embedding')} AS rv
      FROM embeddings, packed
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, r.cand_id,
             {_sql_dot('q.qv', 'r.rv')}
               / (sqrt({_sql_dot('q.qv', 'q.qv')})
                  * sqrt({_sql_dot('r.rv', 'r.rv')})) AS sq8_sim
      FROM recon r CROSS JOIN q WHERE r.cand_id <> q.query_id
    )
    SELECT query_id, cand_id, sq8_sim, rank FROM (
      SELECT query_id, cand_id, sq8_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sq8_sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) asymmetric top-k: int8 codes at rest (4x
    smaller scans than float32), raw queries, midpoint reconstruction.
    Every quantization step is a fixed-order IEEE double op mirrored by
    the oracle, so ranks are bit-identical across engines. See
    operators.similarity.sq8_topk for the at-rest framing and
    ann_ivf_sq8_topk for the composition that replaces the full scan at
    corpus scale."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.sq8_topk(e, queries, k=10).orderBy("query_id", "rank")


@register(
    "ann_ivf_sq8_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=4)},
    {_SQ8_STATS_CTES},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec
          FROM embeddings WHERE vec_id < 8),
    assigned AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT c.cand_id, c.cand_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT cand_id, cell_id, {_sql_sq8_recon('cand_vec')} AS rv
      FROM assigned, packed
    ),
    probes AS (
      SELECT query_id, query_vec, cell_id FROM (
        SELECT q.query_id, q.query_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cosine('q.query_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= 12
    ),
    scored AS (
      SELECT p.query_id, r.cand_id,
             {_sql_dot('p.query_vec', 'r.rv')}
               / (sqrt({_sql_dot('p.query_vec', 'p.query_vec')})
                  * sqrt({_sql_dot('r.rv', 'r.rv')})) AS sq8_sim
      FROM recon r JOIN probes p USING (cell_id)
      WHERE r.cand_id <> p.query_id
    )
    SELECT query_id, cand_id, sq8_sim, rank FROM (
      SELECT query_id, cand_id, sq8_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sq8_sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 5 ORDER BY query_id, rank
    """,
)
def ann_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + SQ8 composed: probed cells bound the work, int8 codes bound
    the bytes — the deployment shape for scalar-quantized search at
    corpus scale (ann_ivf_topk's cells + ann_sq8_topk's asymmetric
    metric; same training sample, probes and tie-breaks as the IVF-flat
    query, so the three mirrors share every constant)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return S.ivf_sq8_topk(
        e, queries, k=5, n_cells=16, n_probe=12, kmeans_sample_mod=4
    ).orderBy("query_id", "rank")


@register(
    "cluster_balanced_sample",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=4)},
    assigned AS (
      SELECT cand_id, cell_id FROM (
        SELECT c.cand_id, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    sized AS (
      SELECT cand_id, cell_id,
             COUNT(*) OVER (PARTITION BY cell_id) AS cell_size,
             ROW_NUMBER() OVER (PARTITION BY cell_id
                                ORDER BY md5(CAST(cand_id AS VARCHAR)),
                                         cand_id) AS pick_rank
      FROM assigned
    )
    SELECT cand_id AS vec_id, cell_id,
           CAST(cell_size AS BIGINT) AS cell_size,
           CAST(pick_rank AS BIGINT) AS pick_rank
    FROM sized
    WHERE pick_rank * 5 <= cell_size * 1 + 4
    ORDER BY cell_id, pick_rank
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced 20% coreset: per trained-KMeans cell, keep the
    ceil(cell_size/5) members ranked by md5(id) — diversity-preserving
    selection (every embedding-space region keeps ceil-proportional
    representation; a global random sample would over-draw dense cells
    and can drop small ones entirely). Same training sample and
    tie-breaks as the IVF family; integer keep rule, no float, no RNG —
    any engine/partitioning/rerun picks the identical set."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.cluster_balanced_sample(
        e, rate_num=1, rate_den=5, n_cells=16, kmeans_sample_mod=4
    ).orderBy("cell_id", "pick_rank")


# ---------------------------------------------------------------------------
# Scale-path twins, oracle-backed (round-9 verdict #5): the three queries
# whose registered forms are quadratic BY DECLARED SEMANTICS each have a
# coded 100 TB-shape path (sqrt-cells blocking / fixed query sample);
# these register those paths with full DuckDB oracles so the driver
# correctness-pins the code users should actually run at scale, not just
# its recall/bench numbers.


@register(
    "knn_label_eval_ann",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(sample_mod=4)},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec
          FROM embeddings WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT 400),
    {_sql_ivf_search(n_probe=12, k=10, as_cte="topk")},
    lab AS (
      SELECT t.query_id, eq.label AS true_label, ec.label AS cand_label
      FROM topk t
      JOIN embeddings eq ON eq.vec_id = t.query_id
      JOIN embeddings ec ON ec.vec_id = t.cand_id
    ),
    votes AS (
      SELECT query_id, true_label, cand_label, COUNT(*) AS n_votes
      FROM lab GROUP BY query_id, true_label, cand_label
    ),
    pred AS (
      SELECT query_id, true_label, cand_label AS predicted FROM (
        SELECT query_id, true_label, cand_label, n_votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, cand_label) AS vr
        FROM votes
      ) WHERE vr = 1
    )
    SELECT CAST(true_label AS INTEGER) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy
    FROM pred GROUP BY true_label ORDER BY label
    """,
)
def knn_label_eval_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for ``knn_label_eval``: ANN (IVF 16/12) top-k over
    a FIXED-size query sample (400, capped regardless of corpus size)
    replaces the corpus-proportional sample x brute-force kernel that
    makes the registered form quadratic (its own docstring names this
    swap; 1.99x vs 24x wall at 10x rows, scaling_sweep.json
    ``scale_paths``). Accuracy degrades by exactly the pinned IVF recall
    gap (tests/test_ann_recall.py). Vote/accuracy tail identical to
    knn_label_eval; majority ties break on the smaller label."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 5 == 0).orderBy("vec_id").limit(400)
    topk = S.ivf_topk(e, q, k=10, n_cells=16, n_probe=12, kmeans_sample_mod=4)
    labels = e.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")
    )
    truth = q.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = (
        topk.join(labels, "cand_id")
        .join(F.broadcast(truth), "query_id")
        .groupBy("query_id", "true_label", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("cand_label")
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("cand_label").alias("predicted"))
    )
    correct = F.when(F.col("predicted") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(correct).alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            (F.col("n_correct").cast("double") / F.col("n_queries")).alias(
                "accuracy"
            ),
        )
        .orderBy("label")
    )


_SQRT_CELLS = "(SELECT GREATEST(16, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) FROM c)"


@register(
    "embedding_neardup_cells",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(n_cells=_SQRT_CELLS, sample_mod=2)},
    assigned AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT c.cand_id, c.cand_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    )
    SELECT a.cand_id AS id_a, b.cand_id AS id_b,
           {_sql_cosine('a.cand_vec', 'b.cand_vec')} AS cosine_sim
    FROM assigned a JOIN assigned b
      ON a.cell_id = b.cell_id AND a.cand_id < b.cand_id
    WHERE {_sql_cosine('a.cand_vec', 'b.cand_vec')} >= 0.4
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for ``embedding_neardup``: near-dup pairs blocked
    by TRAINED KMeans cells with the n_cells = max(16, isqrt(n))
    deployment dial (r10: was a pinned 45 ~ sqrt(2000) — sized for
    sf0.1 and quadratic past it; the 10x sweep read 3.18x and rising)
    instead of the fixed-cardinality label attribute whose block sizes
    grow linearly with the corpus. Same recall caveat as any
    single-probe blocking: pairs straddling a cell boundary are missed
    — the dial is n_cells/n_iters, or the LSH verifier family for
    guarantees. Same 0.4 threshold as embedding_neardup (the synthetic
    embeddings are near-uniform). The oracle computes the identical
    cell count via the `_SQRT_CELLS` scalar-subquery init LIMIT."""
    import math

    e = load_table(spark, sf_dir, "embeddings")
    n_cells = max(16, math.isqrt(e.count()))
    return S.cell_blocked_near_duplicates(
        e, n_cells=n_cells, threshold=0.4
    ).orderBy("id_a", "id_b")


@register(
    "ann_incremental_cells",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding, {_B16} AS b FROM embeddings),
    c AS (SELECT vec_id AS cand_id, embedding AS cand_vec
          FROM base WHERE b <> 0),
    {_sql_kmeans_ctes(n_cells=_SQRT_CELLS, sample_mod=4, init_from="(SELECT vec_id, embedding FROM base WHERE b <> 0)")},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec
          FROM base WHERE b = 0),
    {_sql_ivf_search(n_probe=12, k=5)}
    """,
)
def ann_incremental_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for ``ann_incremental``: the same incremental
    batch-vs-corpus ANN join with the deployment dial applied —
    n_cells = max(16, isqrt(corpus)) with n_probe fixed at 12, so
    per-query work is O(12 * corpus / sqrt(corpus)) and total batch
    cost O(n^1.5) instead of the 16-cell form's O(batch x corpus / 16)
    (2.32x vs 13.4x wall at 10x rows, scaling_sweep.json
    ``scale_paths``). The oracle computes the identical cell count via
    a scalar subquery in the init LIMIT; isqrt on the exact count and
    floor(sqrt(double)) agree for any corpus a LIMIT can see."""
    import math

    from ..functions.hashing import md5_bucket

    e = load_table(spark, sf_dir, "embeddings")
    bucket = md5_bucket(F.col("vec_id"), 16)
    corpus = e.filter(bucket != 0)
    batch = e.filter(bucket == 0)
    n_cells = max(16, math.isqrt(corpus.count()))
    cent = S.kmeans_centroids(
        corpus, n_cells=n_cells, n_iters=2, sample_mod=4
    ).select(F.col("cell_id").alias("vec_id"), F.col("cell_vec").alias("embedding"))
    return S.ivf_topk(
        corpus, batch, k=5, n_cells=n_cells, n_probe=12, centroids=cent
    ).orderBy("query_id", "rank")


@register(
    "semdedup_keep_cells",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM embeddings),
    {_sql_kmeans_ctes(n_cells=_SQRT_CELLS, sample_mod=2)},
    assigned AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT c.cand_id, c.cand_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    sims AS (
      SELECT a.cand_id, a.cand_vec, a.cell_id,
             {_sql_cosine('a.cand_vec', 'cent.cell_vec')} AS centroid_sim
      FROM assigned a JOIN cent ON a.cell_id = cent.cell_id
    ),
    pairs AS (
      SELECT b.cand_id AS id_b, a.cand_id AS id_a, a.centroid_sim AS sim_a
      FROM sims a JOIN sims b ON a.cell_id = b.cell_id
       AND (a.centroid_sim > b.centroid_sim
            OR (a.centroid_sim = b.centroid_sim AND a.cand_id < b.cand_id))
      WHERE {_sql_cosine('a.cand_vec', 'b.cand_vec')} >= {SEMDEDUP_THRESHOLD}
    ),
    killers AS (
      SELECT id_b, id_a AS dup_of FROM (
        SELECT id_b, id_a,
               ROW_NUMBER() OVER (PARTITION BY id_b
                                  ORDER BY sim_a DESC, id_a ASC) AS rn
        FROM pairs
      ) WHERE rn = 1
    )
    SELECT s.cand_id AS vec_id, s.cell_id, s.centroid_sim,
           CAST(CASE WHEN k.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
           k.dup_of
    FROM sims s LEFT JOIN killers k ON s.cand_id = k.id_b
    ORDER BY vec_id
    """,
)
def semdedup_keep_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for ``semdedup_keep``: identical SemDeDup
    keep/drop semantics with the deployment dial applied — n_cells =
    max(16, isqrt(n)) instead of the registered form's oracle-pinned
    16 cells, so per-cell membership is ~sqrt(n) and the within-cell
    pair count stays O(n) as the corpus grows (the 16-cell form's
    pairs grow n^2/16 by declared semantics — 3.25x wall at 10x rows,
    scaling_sweep.json). Same recall caveat as every single-probe
    blocking: semantic duplicates straddling a cell boundary are not
    compared. The oracle computes the identical cell count via the
    scalar-subquery init LIMIT (`_SQRT_CELLS`); isqrt on the exact
    count and floor(sqrt(double)) agree for any corpus a LIMIT can
    see (the ann_incremental_cells precedent)."""
    import math

    e = load_table(spark, sf_dir, "embeddings")
    n_cells = max(16, math.isqrt(e.count()))
    return S.semdedup_decisions(
        e,
        n_cells=n_cells,
        n_iters=2,
        threshold=SEMDEDUP_THRESHOLD,
        sample_mod=2,
    ).orderBy("vec_id")


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec, label AS query_label
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id, c.label AS neg_label,
             {_sql_cosine('q.query_vec', 'c.embedding')} AS cosine_sim
      FROM embeddings c CROSS JOIN q
      WHERE c.label <> q.query_label
    )
    SELECT query_id, cand_id, CAST(neg_label AS INTEGER) AS neg_label,
           cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, cand_id, neg_label, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, cand_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators.similarity.hard_negatives): per
    query vector, the 10 most-similar corpus vectors of a DIFFERENT
    label — the near-miss negatives contrastive embedding training
    feeds (DPR/SBERT recipe; random negatives are trivially separable).
    The label predicate sits inside the scored join so the rank is over
    true negatives only — a post-filtered shortlist would under-fill
    when same-label vectors crowd the head."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return S.hard_negatives(e, q, k=10).orderBy("query_id", "rank")


_TRUNC_DIMS = 16
_TRUNC_FACTOR = 4


@register(
    "ann_truncated_rerank",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec,
                      embedding[1:{_TRUNC_DIMS}] AS query_pre
               FROM embeddings WHERE vec_id < 8),
    pre_scored AS (
      SELECT q.query_id, q.query_vec, c.vec_id AS cand_id, c.embedding AS cand_vec,
             {_sql_cosine('q.query_pre', f'c.embedding[1:{_TRUNC_DIMS}]')} AS pre_sim
      FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id
    ),
    short AS (
      SELECT query_id, query_vec, cand_id, cand_vec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY pre_sim DESC, cand_id) AS prerank
        FROM pre_scored
      ) WHERE prerank <= {10 * _TRUNC_FACTOR}
    )
    SELECT query_id, cand_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, cand_id,
             {_sql_cosine('query_vec', 'cand_vec')} AS cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY {_sql_cosine('query_vec', 'cand_vec')} DESC,
                                         cand_id) AS rank
      FROM short
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def ann_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-adaptive retrieval (the Matryoshka serving pattern):
    shortlist on the first 16 of 64 dims (4x fewer multiply-adds per
    pair; a deployment stores the prefix columnarly for a 4x smaller
    scan), exact full-dim re-rank on the 40-candidate shortlist. See
    operators.similarity.truncated_rerank_topk; recall floor pinned in
    tests/test_ann_recall.py (the fixture is not MRL-trained, so the
    prefix carries a random 25% of the information, not a front-loaded
    share — the floor documents exactly that)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return S.truncated_rerank_topk(
        e, q, k=10, prefix_dims=_TRUNC_DIMS, shortlist_factor=_TRUNC_FACTOR
    ).orderBy("query_id", "rank")


def _sql_ranking_metrics() -> str:
    """Oracle text for retrieval_quality_metrics, with the 1/log2(r+1)
    discount table and its prefix sums computed ONCE in Python and
    embedded as double literals in BOTH plans — no engine evaluates a
    transcendental, so the metrics are bit-identical."""
    import math

    k = 10
    disc = [1.0 / math.log2(r + 1) for r in range(1, k + 1)]
    prefix = [0.0]
    for d in disc:
        prefix.append(prefix[-1] + d)
    # The e0 suffix matters: DuckDB parses a bare decimal literal as
    # DECIMAL first (17 fractional digits overflow DECIMAL(18,x) and a
    # later CAST AS DOUBLE keeps the decimal-rounded value, one ulp off
    # Python's repr round-trip — observed on 1/log2(6)); an exponent
    # makes the literal parse DIRECTLY as DOUBLE, bit-exact both ways.
    disc_lit = ", ".join(f"{d!r}e0" for d in disc)
    prefix_lit = ", ".join(f"{p!r}e0" for p in prefix)
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec, label AS qlabel
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             {_sql_cosine('q.query_vec', 'c.embedding')} AS cosine_sim
      FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, rank FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, cand_id) AS rank
        FROM scored
      ) WHERE rank <= {k}
    ),
    pool AS (
      SELECT q.query_id, c.vec_id AS cand_id
      FROM embeddings c JOIN q ON c.label = q.qlabel AND c.vec_id <> q.query_id
    ),
    pool_sizes AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_relevant_pool
      FROM pool GROUP BY query_id
    ),
    hits AS (
      SELECT r.query_id, r.rank, [{disc_lit}][r.rank] AS gain
      FROM ranked r JOIN pool p USING (query_id, cand_id)
    ),
    per_q AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits_at_k,
             MIN(rank) AS first_rank,
             list_reduce(list(gain ORDER BY rank), (x, y) -> x + y) AS dcg
      FROM hits GROUP BY query_id
    )
    SELECT qq.query_id,
           COALESCE(ps.n_relevant_pool, 0) AS n_relevant_pool,
           COALESCE(pq.hits_at_k, 0) AS hits_at_k,
           CAST(COALESCE(pq.hits_at_k, 0) AS DOUBLE) / CAST({float(k)!r} AS DOUBLE)
             AS precision_at_k,
           COALESCE(CAST(1.0 AS DOUBLE) / CAST(pq.first_rank AS DOUBLE), 0.0)
             AS mrr,
           COALESCE(pq.dcg, 0.0) AS dcg,
           CASE WHEN COALESCE(ps.n_relevant_pool, 0) > 0
                THEN [{prefix_lit}][CAST(LEAST({k}, ps.n_relevant_pool) + 1 AS INTEGER)]
                ELSE 0.0 END AS idcg,
           CASE WHEN COALESCE(ps.n_relevant_pool, 0) > 0
                 AND [{prefix_lit}][CAST(LEAST({k}, ps.n_relevant_pool) + 1 AS INTEGER)] > 0.0
                THEN COALESCE(pq.dcg, 0.0)
                     / [{prefix_lit}][CAST(LEAST({k}, ps.n_relevant_pool) + 1 AS INTEGER)]
                ELSE 0.0 END AS ndcg
    FROM (SELECT DISTINCT query_id FROM ranked) qq
    LEFT JOIN pool_sizes ps USING (query_id)
    LEFT JOIN per_q pq USING (query_id)
    ORDER BY query_id
    """


@register("retrieval_quality_metrics", oracle=_sql_ranking_metrics())
def retrieval_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the exact-cosine retriever against
    the same-label relevance pool: per query, precision@10, MRR, and
    binary nDCG@10 (operators.similarity.ranking_metrics) — the metric
    harness every index/fusion variant in the ANN family can be scored
    with (hand it any (query_id, cand_id, rank) frame). Discounts and
    their prefix sums are Python-computed double literals in both
    engines; DCG folds gains in rank order; the relevance pool (not
    just retrieved hits) normalizes IDCG."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    ranked = S.brute_force_topk(e, q, k=10).select(
        "query_id", "cand_id", "rank"
    )
    ql = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))
    cl = e.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("clabel"))
    relevant = (
        ql.crossJoin(cl)
        .filter(
            (F.col("qlabel") == F.col("clabel"))
            & (F.col("cand_id") != F.col("query_id"))
        )
        .select("query_id", "cand_id")
    )
    return S.ranking_metrics(ranked, relevant, k=10).orderBy("query_id")


@register(
    "contrastive_triplets",
    oracle=f"""
    WITH a AS (SELECT vec_id AS anchor_id, embedding AS avec, label AS albl
               FROM embeddings WHERE vec_id < 32),
    pos AS (
      SELECT anchor_id, cand_id AS pos_id, cosine_sim AS pos_sim FROM (
        SELECT a.anchor_id, c.vec_id AS cand_id,
               {_sql_cosine('a.avec', 'c.embedding')} AS cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY a.anchor_id
                                  ORDER BY {_sql_cosine('a.avec', 'c.embedding')} DESC,
                                           c.vec_id) AS rn
        FROM embeddings c CROSS JOIN a
        WHERE c.label = a.albl AND c.vec_id <> a.anchor_id
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT anchor_id, cand_id AS neg_id, cosine_sim AS neg_sim FROM (
        SELECT a.anchor_id, c.vec_id AS cand_id,
               {_sql_cosine('a.avec', 'c.embedding')} AS cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY a.anchor_id
                                  ORDER BY {_sql_cosine('a.avec', 'c.embedding')} DESC,
                                           c.vec_id) AS rn
        FROM embeddings c CROSS JOIN a
        WHERE c.label <> a.albl
      ) WHERE rn = 1
    )
    SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
           p.pos_sim - n.neg_sim AS margin,
           CASE WHEN p.pos_sim - n.neg_sim > 0.0 THEN 'satisfied'
                ELSE 'violating' END AS difficulty
    FROM pos p JOIN neg n USING (anchor_id)
    ORDER BY anchor_id
    """,
)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-triplet mining with a margin audit (the FaceNet /
    SBERT training-pair export): per anchor, the hardest in-class
    positive (top same-label cosine) and the hardest cross-class
    negative (top different-label cosine — the rank-1 row of
    operators.similarity.hard_negatives), plus the triplet margin
    pos_sim - neg_sim and its satisfied/violating classification —
    'violating' triplets (negative closer than the positive) are
    exactly the ones a contrastive trainer should sample first. Anchors
    whose label has no other member drop out (no in-class positive
    exists). One fixed-order IEEE subtraction on the shared cosine
    folds keeps the margin bit-identical across engines; at 100 TB
    both sides swap to the ANN family (same (query, cand, rank)
    contract)."""
    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < 32)
    al = anchors.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("avec"),
        F.col("label").alias("albl"),
    )
    cl = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cvec"),
        F.col("label").alias("clbl"),
    )
    from pyspark.sql import Window as W

    from ..functions.vectors import cosine

    scored = (
        cl.crossJoin(F.broadcast(al))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("avec"), F.col("cvec")))
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("cand_id")
    )
    pos = (
        scored.filter(F.col("clbl") == F.col("albl"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("cand_id").alias("pos_id"),
            F.col("cosine_sim").alias("pos_sim"),
        )
    )
    neg = S.hard_negatives(e, anchors, k=1).select(
        F.col("query_id").alias("anchor_id"),
        F.col("cand_id").alias("neg_id"),
        F.col("cosine_sim").alias("neg_sim"),
    )
    return (
        pos.join(neg, "anchor_id")
        .withColumn("margin", F.col("pos_sim") - F.col("neg_sim"))
        .withColumn(
            "difficulty",
            F.when(F.col("margin") > 0.0, F.lit("satisfied")).otherwise(
                F.lit("violating")
            ),
        )
        .orderBy("anchor_id")
    )


@register(
    "embedding_gate_incremental",
    oracle=f"""
    WITH base AS (SELECT vec_id, embedding, {_B16} AS b FROM embeddings),
    c AS (SELECT vec_id AS cand_id, embedding AS cand_vec FROM base WHERE b <> 0),
    {_sql_kmeans_ctes(n_cells=_SQRT_CELLS, sample_mod=4, init_from="(SELECT vec_id, embedding FROM base WHERE b <> 0)")},
    q AS (SELECT vec_id AS query_id, embedding AS query_vec
          FROM base WHERE b = 0),
    assigned AS (
      SELECT cand_id, cand_vec, cell_id FROM (
        SELECT c.cand_id, c.cand_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY c.cand_id
                                  ORDER BY {_sql_cosine('c.cand_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, query_vec, cell_id FROM (
        SELECT q.query_id, q.query_vec, cent.cell_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_cosine('q.query_vec', 'cent.cell_vec')} DESC,
                                           cent.cell_id DESC) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn = 1
    ),
    hits AS (
      SELECT DISTINCT p.query_id
      FROM assigned a JOIN probes p USING (cell_id)
      WHERE {_sql_cosine('p.query_vec', 'a.cand_vec')} >= 0.4
    )
    SELECT q.query_id AS vec_id,
           CASE WHEN h.query_id IS NOT NULL THEN 'embedding_dup'
                ELSE 'unique' END AS verdict
    FROM q LEFT JOIN hits h ON q.query_id = h.query_id
    ORDER BY vec_id
    """,
)
def embedding_gate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r11 sixth streaming net's decision rule, oracle-backed at the
    batch-vs-corpus shape the gate runs: corpus = admitted vectors
    (deterministic 15/16 hash split), batch = the arriving 1/16;
    centroids train on the CORPUS ONLY with the n_cells = max(16,
    isqrt(|corpus|)) deployment dial (the `_SQRT_CELLS` scalar-subquery
    LIMIT on the oracle side); both sides assign to their single
    nearest cell and a batch vector with any same-cell corpus neighbor
    at cosine >= 0.4 is `embedding_dup` (0.4 matches embedding_neardup
    — the synthetic embeddings are near-uniform, so the store default
    0.995 would reject nothing at test scale). Streaming parity: the
    same rule runs store-incrementally in streaming/dedup_ingest via
    the composed VectorIngest (tests/test_streaming.py pins the
    paraphrase-catch the five lexical nets miss)."""
    import math

    from ..functions.hashing import md5_bucket

    e = load_table(spark, sf_dir, "embeddings")
    bucket = md5_bucket(F.col("vec_id"), 16)
    corpus = e.filter(bucket != 0)
    batch = e.filter(bucket == 0)
    n_cells = max(16, math.isqrt(corpus.count()))
    return S.cell_blocked_gate_status(
        corpus, batch, n_cells=n_cells, threshold=0.4, sample_mod=4
    ).orderBy("vec_id")
