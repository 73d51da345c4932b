"""Deduplication query surface over the ``documents`` table.

Each query pairs the distributed operator (operators.dedup) with a
single-threaded DuckDB oracle that reproduces the same md5-based hashing
bit-for-bit — the LSH pipelines are therefore fully value-checked, not
just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import dedup as D

QUERIES = {}
ORACLES = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


NUM_HASHES = 8
BAND_SIZE = 2
N_BANDS = NUM_HASHES // BAND_SIZE


def _sql_sigs(src: str = "documents", sfx: str = "") -> str:
    """tok/sh/sigs CTE chain over ``src``; ``sfx`` suffixes the CTE names
    so two chains (corpus vs batch) can coexist in one query."""
    sig_exprs = ",\n             ".join(
        f"list_min(list_transform(shingles, t -> md5('{j}:' || t))) AS sig_{j}"
        for j in range(NUM_HASHES)
    )
    return (
        r"""
    tok{sfx} AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tokens
            FROM {src}),
    sh{sfx} AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(0, greatest(len(tokens) - 3, 0)),
               i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' ')
             )) AS shingles
      FROM tok{sfx}
    ),
    sigs{sfx} AS (
      SELECT doc_id, shingles,
             {sig_exprs}
      FROM sh{sfx}
    )""".replace("{sig_exprs}", sig_exprs)
        .replace("{src}", src)
        .replace("{sfx}", sfx)
    )


def _sql_bands(sfx: str = "") -> str:
    rows = []
    for b in range(N_BANDS):
        parts = " || '|' || ".join(f"sig_{b * BAND_SIZE + k}" for k in range(BAND_SIZE))
        rows.append(
            f"SELECT doc_id, {b} AS band_idx, md5({parts}) AS band_hash FROM sigs{sfx}"
        )
    return " UNION ALL ".join(rows)


_SQL_JACCARD = (
    "CAST(len(list_filter(sa.shingles, t -> list_contains(sb.shingles, t))) AS DOUBLE)"
    " / CAST(len(sa.shingles) + len(sb.shingles)"
    "        - len(list_filter(sa.shingles, t -> list_contains(sb.shingles, t))) AS DOUBLE)"
)

JACCARD_THRESHOLD = 0.4


def _sql_candidate_pairs() -> str:
    return """
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    """


def _sql_verified_pairs(threshold: float = JACCARD_THRESHOLD, with_score: bool = False) -> str:
    score = f", {_SQL_JACCARD} AS jaccard" if with_score else ""
    return f"""
      SELECT p.id_a, p.id_b{score}
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.id_a
      JOIN sh sb ON sb.doc_id = p.id_b
      WHERE {_SQL_JACCARD} >= {threshold}
    """


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY content_hash ORDER BY keeper_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(d).select("content_hash", "keeper_id", "n_copies").orderBy(
        "keeper_id"
    )


@register(
    "dedup_minhash",
    oracle=f"""
    WITH {_sql_sigs()},
    banded AS ({_sql_bands()}),
    pairs AS ({_sql_candidate_pairs()})
    {_sql_verified_pairs(with_score=True)}
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_near_duplicates(
        d, num_hashes=NUM_HASHES, band_size=BAND_SIZE, threshold=JACCARD_THRESHOLD
    ).orderBy("id_a", "id_b")


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_sql_sigs()},
    banded AS ({_sql_bands()}),
    pairs AS ({_sql_candidate_pairs()}),
    verified AS ({_sql_verified_pairs()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION SELECT id_b, id_a FROM verified
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
    FROM reach GROUP BY src ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clustering: minhash-LSH pairs (Jaccard-verified)
    grouped into connected components by min-label propagation — the
    step that turns pairwise similarity into keep/drop decisions."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_duplicates(
        d, num_hashes=NUM_HASHES, band_size=BAND_SIZE, threshold=JACCARD_THRESHOLD
    )
    return D.connected_components(pairs).orderBy("doc_id")


SIMHASH_BITS = 64


def _sql_simhash(bits: int = SIMHASH_BITS) -> str:
    sums = ",\n             ".join(
        f"SUM(CASE WHEN substr(h, {p + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s{p}"
        for p in range(bits)
    )
    sig = " || ".join(f"(CASE WHEN s{p} >= 0 THEN '1' ELSE '0' END)" for p in range(bits))
    return r"""
    tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tokens
            FROM documents),
    shex AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(0, greatest(len(tokens) - 3, 0)),
               i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' ')
             ))) AS shingle
      FROM tok
    ),
    hashed AS (
      SELECT doc_id, md5('a:' || shingle) || md5('b:' || shingle) AS h FROM shex
    ),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {sig} AS simhash FROM sums)""".replace(
        "{sums}", sums
    ).replace("{sig}", sig)


def _sql_simhash_bands(bits: int = SIMHASH_BITS, n_bands: int = 4) -> str:
    width = bits // n_bands
    rows = [
        f"SELECT doc_id, simhash, {b} AS band_idx,"
        f" substr(simhash, {b * width + 1}, {width}) AS band_bits FROM sigs"
        for b in range(n_bands)
    ]
    return " UNION ALL ".join(rows)


_HAMMING = " + ".join(
    f"(CASE WHEN substr(a.simhash, {p + 1}, 1) <> substr(b.simhash, {p + 1}, 1)"
    " THEN 1 ELSE 0 END)"
    for p in range(SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_sql_simhash()},
    banded AS ({_sql_simhash_bands()})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, {_HAMMING} AS hamming
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
     AND a.doc_id < b.doc_id
    WHERE {_HAMMING} <= 3
    ORDER BY id_a, id_b
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = D.simhash_signatures(d)
    return D.simhash_near_duplicates(sigs).orderBy("id_a", "id_b")


@register(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tokens
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(0, greatest(len(tokens) - 3, 0)),
               i -> array_to_string(list_slice(tokens, i + 1, i + 3), ' ')
             ))) AS shingle
      FROM tok
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 100),
    idx AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY id_a, id_b
    )
    SELECT s.id_a, s.id_b,
           CAST(s.shared AS DOUBLE) / CAST(ca.n_shingles + cb.n_shingles - s.shared AS DOUBLE) AS jaccard
    FROM shared s
    JOIN counts ca ON ca.doc_id = s.id_a
    JOIN counts cb ON cb.doc_id = s.id_b
    WHERE CAST(s.shared AS DOUBLE) / CAST(ca.n_shingles + cb.n_shingles - s.shared AS DOUBLE) >= 0.3
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # max_shingle_df=100 (mirrored in the oracle's `hot` CTE): a shingle
    # shared by >100 docs would contribute >100^2 candidate rows and no
    # discriminative signal — the stop-shingle guard keeps the operator
    # safe to call blind.
    return D.ngram_jaccard_pairs(
        d, n=3, threshold=0.3, max_shingle_df=100
    ).orderBy("id_a", "id_b")


@register(
    "dedup_incremental",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
    batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4),
    {_sql_sigs('corpus', '_c')},
    {_sql_sigs('batch', '_b')},
    banded_c AS ({_sql_bands('_c')}),
    banded_b AS ({_sql_bands('_b')}),
    exact_ids AS (
      SELECT DISTINCT b.doc_id FROM batch b
      JOIN (SELECT DISTINCT md5(text) AS h FROM corpus) c ON md5(b.text) = c.h
    ),
    cross_cand AS (
      SELECT DISTINCT bb.doc_id AS id_a, cc.doc_id AS id_b
      FROM banded_b bb JOIN banded_c cc
        ON bb.band_idx = cc.band_idx AND bb.band_hash = cc.band_hash
    ),
    near_corpus AS (
      SELECT DISTINCT p.id_a AS doc_id
      FROM cross_cand p
      JOIN sh_b sa ON sa.doc_id = p.id_a
      JOIN sh_c sb ON sb.doc_id = p.id_b
      WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
    ),
    batch_cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded_b a JOIN banded_b b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    near_batch AS (
      SELECT DISTINCT p.id_b AS doc_id
      FROM batch_cand p
      JOIN sh_b sa ON sa.doc_id = p.id_a
      JOIN sh_b sb ON sb.doc_id = p.id_b
      WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
    )
    SELECT b.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nc.doc_id IS NOT NULL THEN 'near_dup_corpus'
                WHEN nb.doc_id IS NOT NULL THEN 'near_dup_batch'
                ELSE 'unique' END AS verdict
    FROM batch b
    LEFT JOIN exact_ids e ON b.doc_id = e.doc_id
    LEFT JOIN near_corpus nc ON b.doc_id = nc.doc_id
    LEFT JOIN near_batch nb ON b.doc_id = nb.doc_id
    ORDER BY b.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-increment dedup: classify the doc_id%5==4 slice (the "new
    batch") against the rest of `documents` (the "accepted corpus") —
    exact digest, LSH near-dup vs corpus, min-id near-dup within batch."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 4)
    batch = d.filter(F.col("doc_id") % 5 == 4)
    return D.incremental_dedup_status(
        corpus,
        batch,
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
        threshold=JACCARD_THRESHOLD,
    ).orderBy("doc_id")


def _sql_quality() -> str:
    """The quality-score expression, kept formula-identical to
    queries.text.quality_score so canonical selection and the standalone
    score stay consistent."""
    from . import text as TQ

    toks = TQ.SQL_TOKENS
    stop = TQ._EN
    return (
        f"least(CAST(len({toks}) AS DOUBLE) / 64.0, 1.0) * 0.4"
        f" + least(CAST({stop} AS DOUBLE) / CAST(len({toks}) AS DOUBLE) * 4, 1.0) * 0.4"
        f" + (1 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
        f" / CAST(length(text) AS DOUBLE) * 10, 1.0)) * 0.2"
    )


def _dedup_canonical_oracle() -> str:
    return f"""
    WITH RECURSIVE {_sql_sigs()},
    banded AS ({_sql_bands()}),
    pairs AS ({_sql_candidate_pairs()}),
    verified AS ({_sql_verified_pairs()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION SELECT id_b, id_a FROM verified
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
      SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    q AS (SELECT doc_id, {_sql_quality()} AS quality_score FROM documents)
    SELECT cluster_id, doc_id AS canonical_id, n_members FROM (
      SELECT c.cluster_id, c.doc_id,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality_score DESC, c.doc_id) AS rn
      FROM clusters c JOIN q USING (doc_id)
    ) WHERE rn = 1 ORDER BY cluster_id
    """


@register("dedup_canonical", oracle=_dedup_canonical_oracle())
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: within each near-duplicate cluster
    keep the HIGHEST-QUALITY member (not the smallest id) — the keep/drop
    policy an LLM corpus actually wants. Clusters come from the
    LSH-verified pair graph; quality is the shared heuristic score, and
    the tie-break is deterministic (score DESC, doc_id ASC). Scores are
    bit-identical across engines (pure projection arithmetic), so the
    argmax is oracle-exact."""
    from pyspark.sql import Window as W

    from ..operators.text import quality_scores

    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_duplicates(
        d, num_hashes=NUM_HASHES, band_size=BAND_SIZE, threshold=JACCARD_THRESHOLD
    )
    clusters = D.connected_components(pairs)
    q = quality_scores(d).select("doc_id", "quality_score")
    j = clusters.join(q, "doc_id")
    per_cluster = W.partitionBy("cluster_id")
    ranked = per_cluster.orderBy(F.col("quality_score").desc(), F.col("doc_id"))
    return (
        j.withColumn("n_members", F.count("*").over(per_cluster))
        .withColumn("rn", F.row_number().over(ranked))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("canonical_id"), "n_members")
        .orderBy("cluster_id")
    )


_SPAN_K = 4
_SPAN_MIN_LEN = 6
_SPAN_MAX_DF = 100


@register(
    "exact_substring_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS h
      FROM tok, unnest(range(1, len(t) - {_SPAN_K - 2})) AS u(i)
      WHERE len(t) >= {_SPAN_K}
    ),
    hot AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(*) > {_SPAN_MAX_DF}
    ),
    idx AS (
      SELECT * FROM sh WHERE h NOT IN (SELECT h FROM hot)
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pos_a, b.pos AS pos_b, a.pos - b.pos AS diag
      FROM idx a JOIN idx b USING (h)
      WHERE a.doc_id < b.doc_id
    ),
    islands AS (
      SELECT id_a, id_b, diag, pos_a, pos_b,
             pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag
                                        ORDER BY pos_a) AS island
      FROM cand
    )
    SELECT id_a, id_b,
           CAST(MIN(pos_a) AS BIGINT) AS a_start,
           CAST(MIN(pos_b) AS BIGINT) AS b_start,
           CAST(COUNT(*) + {_SPAN_K - 1} AS BIGINT) AS match_len
    FROM islands GROUP BY id_a, id_b, diag, island
    HAVING COUNT(*) + {_SPAN_K - 1} >= {_SPAN_MIN_LEN}
    ORDER BY id_a, id_b, a_start, b_start
    """,
)
def exact_substring_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal verbatim shared token runs (>= 6 tokens) across document
    pairs, with positions in both documents — the positional evidence for
    exact-substring deduplication, via shingle-diagonal island merging."""
    d = load_table(spark, sf_dir, "documents")
    return D.exact_substring_spans(
        d, k=_SPAN_K, min_len=_SPAN_MIN_LEN, max_shingle_df=_SPAN_MAX_DF
    ).orderBy("id_a", "id_b", "a_start", "b_start")


# --- Content-defined chunking (round 7) -------------------------------------

from ..functions.hashing import sql_md5_mod as _sql_md5_mod  # noqa: E402

# Shared CTE: per-doc content-defined chunk arrays (k=8, divisor=32 —
# mean chunk ~32 chars). Mirrors operators/dedup.cdc_chunks exactly.
_CDC_CH = f"""
    c AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
             list_filter(
               generate_series(1, greatest(length(text) - 7, 1)),
               i -> ({_sql_md5_mod("substr(text, i, 8)", 32)} = 0)
                    AND (i + 7 < length(text))
             ) AS cuts
      FROM documents
    ),
    ch AS (
      SELECT doc_id, text,
             list_concat([CAST(1 AS BIGINT)],
                         list_transform(cuts, c -> CAST(c + 8 AS BIGINT)))
               AS starts,
             list_concat(list_transform(cuts, c -> CAST(c + 7 AS BIGINT)),
                         [n]) AS ends
      FROM c
    ),
    chunk_rows AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             starts[i] AS start,
             ends[i] - starts[i] + 1 AS length,
             md5(substr(text, starts[i], ends[i] - starts[i] + 1))
               AS chunk_hash
      FROM (
        SELECT doc_id, text, starts, ends,
               unnest(generate_series(1, len(starts))) AS i
        FROM ch
      )
    )
"""


@register(
    "cdc_chunks",
    oracle=f"""
    WITH {_CDC_CH}
    SELECT doc_id, chunk_idx, start, length, chunk_hash
    FROM chunk_rows WHERE doc_id % 10 = 0
    ORDER BY doc_id, chunk_idx
    """,
)
def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk table (LBFS/rsync hash-mod boundary rule)
    for a deterministic 10% doc slice — boundaries decided by content,
    so chunk hashes survive prefix insertions that shift every byte
    offset. The chunk-granularity complement to shingle similarity."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 10) == 0
    )
    return D.cdc_chunks(d).orderBy("doc_id", "chunk_idx")


@register(
    "cdc_reuse_gate",
    oracle=f"""
    WITH {_CDC_CH},
    bk AS (
      SELECT doc_id, {_sql_md5_mod("CAST(doc_id AS VARCHAR)", 10)} AS bucket
      FROM documents
    ),
    store_h AS (
      SELECT DISTINCT chunk_hash
      FROM chunk_rows JOIN bk USING (doc_id) WHERE bucket <= 8
    ),
    batch_ch AS (
      SELECT DISTINCT doc_id, chunk_hash
      FROM chunk_rows JOIN bk USING (doc_id) WHERE bucket = 9
    ),
    tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
      FROM batch_ch GROUP BY doc_id
    ),
    hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM batch_ch JOIN store_h USING (chunk_hash) GROUP BY doc_id
    )
    SELECT tot.doc_id, n_chunks,
           COALESCE(n_shared, 0) AS n_shared,
           CASE WHEN COALESCE(n_shared, 0) >= 3 THEN 'chunk_dup'
                ELSE 'unique' END AS verdict
    FROM tot LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id
    """,
)
def cdc_reuse_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch analog of the streaming CDC chunk gate
    (streaming/dedup_ingest.py, round 8): classify an arriving batch
    (deterministic 10% md5 slice) against the accepted corpus's
    chunk-hash store (the other 90%) — a doc sharing >= 3 distinct
    content-defined chunk hashes is chunk_dup. This oracle-checks the
    gate's CLASSIFICATION rule end-to-end (the streaming face adds only
    the epoch store protocol, which the crash drills pin); both verdict
    branches are populated at sf0.001 and sf0.01 (15/40, 11/44).

    Scale: the batch side is micro-batch-bounded, so the equi-join's
    matched rows — never the store — size the shuffle; the store join
    key is the 32-byte digest, no text moves."""
    d = load_table(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 10
    )
    store_h = D.cdc_chunks(d.filter(b <= 8)).select("chunk_hash").distinct()
    batch_ch = (
        D.cdc_chunks(d.filter(b == 9)).select("doc_id", "chunk_hash").distinct()
    )
    tot = batch_ch.groupBy("doc_id").agg(
        F.countDistinct("chunk_hash").cast("long").alias("n_chunks")
    )
    hits = (
        batch_ch.join(store_h, "chunk_hash")
        .groupBy("doc_id")
        .agg(F.countDistinct("chunk_hash").cast("long").alias("_h"))
    )
    return (
        tot.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("n_shared"),
            F.when(F.coalesce(F.col("_h"), F.lit(0)) >= 3, F.lit("chunk_dup"))
            .otherwise(F.lit("unique"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )


@register(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH {_CDC_CH}
    SELECT chunk_hash,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           MIN(length) AS length
    FROM chunk_rows WHERE length >= 8
    GROUP BY chunk_hash HAVING COUNT(*) >= 2
    ORDER BY n_occurrences DESC, chunk_hash LIMIT 100
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicate chunks: content-defined chunks (>= one
    gram long — sub-gram slivers carry no reuse signal) shared by >= 2
    occurrences, the chunk-aligned verbatim-reuse report. Group key is
    the 32-byte chunk hash, never the text: the shuffle ships digests,
    and equal hashes imply equal length (same content), so MIN(length)
    is exact, not a summary."""
    d = load_table(spark, sf_dir, "documents")
    chunks = D.cdc_chunks(d).filter(F.col("length") >= 8)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.min("length").alias("length"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.col("n_occurrences").desc(), "chunk_hash")
        .limit(100)
    )


# Sparse lexical cosine near-dup: the AllPairs-style prefix blocking +
# integer-exact verification modality (operators.dedup
# .token_cosine_near_duplicates). Threshold cosine >= 4/5; the keep rule
# is the pure-integer cross-multiplication dot^2*25 >= 16*na2*nb2, so the
# pair set is bit-identical across engines; the reported cosine double is
# one mul + one sqrt + one div over those exact integers.
_COS_PREFIX = 4
_COS_DF_CAP = 100
# The 64-bit overflow fence on the integer keep rule (see
# operators.dedup.cosine_safe_norm_bound): docs past this squared-norm
# bound are excluded from verification on BOTH engines. A no-op on any
# natural corpus (the bound is ~6.07e8 at 4/5); it exists so one
# adversarial blob cannot abort (ANSI) or corrupt (wrapping) the query.
_COS_NORM_BOUND = D.cosine_safe_norm_bound(4, 5)


@register(
    "dedup_bigram_cosine",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, array_to_string(t[i:i+1], ' ') AS term
      FROM tok, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM bg GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    norms AS (SELECT doc_id, SUM(tf*tf) AS n2 FROM tf GROUP BY doc_id
              HAVING SUM(tf*tf) <= {_COS_NORM_BOUND}),
    ranked AS (
      SELECT tf.doc_id, tf.term,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY df.df, tf.term) AS rr
      FROM tf JOIN df USING (term) WHERE df.df <= {_COS_DF_CAP}
    ),
    prefix AS (SELECT doc_id, term FROM ranked WHERE rr <= {_COS_PREFIX}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b USING (term) WHERE a.doc_id < b.doc_id
    ),
    dots AS (
      SELECT c.id_a, c.id_b, SUM(a.tf*b.tf) AS dot
      FROM cand c
      JOIN tf a ON a.doc_id = c.id_a
      JOIN tf b ON b.doc_id = c.id_b AND b.term = a.term
      GROUP BY c.id_a, c.id_b
    )
    SELECT d.id_a, d.id_b, CAST(d.dot AS BIGINT) AS dot,
           CAST(na.n2 AS BIGINT) AS norm_sq_a,
           CAST(nb.n2 AS BIGINT) AS norm_sq_b,
           CAST(d.dot AS DOUBLE)
             / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
             AS cosine_sim
    FROM dots d
    JOIN norms na ON na.doc_id = d.id_a
    JOIN norms nb ON nb.doc_id = d.id_b
    WHERE d.dot*d.dot*25 >= 16*na.n2*nb.n2
    ORDER BY d.id_a, d.id_b
    """,
)
def dedup_bigram_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-bigrams TF-cosine near-duplicate pairs (cosine >= 0.8):
    rare-term prefix blocking generates candidates (each doc posts its
    4 globally-rarest bigrams, df-capped), exact integer dot/norm
    verification keeps true pairs. See the operator docstring for the
    shuffle budget and the AllPairs lineage; on this corpus the blocking
    keeps all 25 true pairs while generating 10x fewer candidates than
    the plain inverted-index join."""
    d = load_table(spark, sf_dir, "documents")
    return D.token_cosine_near_duplicates(
        d, ngram=2, rare_prefix=_COS_PREFIX, max_term_df=_COS_DF_CAP,
        threshold_num=4, threshold_den=5,
    ).orderBy("id_a", "id_b")


# CCNet/C4-style frequent-segment document filter: a doc dominated by
# corpus-frequent k-token tiles is boilerplate/duplication, not fresh
# text. Tile unit = operators.dedup.fixed_tile_profile (non-overlapping
# 8-token tiles); a tile is "shared" when its hash occurs in more than
# one DISTINCT document; the keep rule is the integer comparison
# 2*n_shared_tiles <= n_tiles (shared fraction <= 1/2).
_TILE_K = 8


@register(
    "frequent_segment_filter",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    tiles AS (
      SELECT doc_id,
             md5(array_to_string(t[(i*{_TILE_K}+1):(i*{_TILE_K}+{_TILE_K})], ' ')) AS h
      FROM tok, unnest(range(0, CAST(floor(len(t)/{_TILE_K}) AS BIGINT))) AS u(i)
      WHERE len(t) >= {_TILE_K}
    ),
    freq AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM tiles GROUP BY h),
    perdoc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tiles,
             CAST(COUNT(*) FILTER (WHERE f.ndocs > 1) AS BIGINT) AS n_shared_tiles
      FROM tiles JOIN freq f USING (h) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_tiles, 0) AS n_tiles,
           COALESCE(p.n_shared_tiles, 0) AS n_shared_tiles,
           CASE WHEN COALESCE(p.n_tiles, 0) = 0 THEN 0.0
                ELSE CAST(p.n_shared_tiles AS DOUBLE) / CAST(p.n_tiles AS DOUBLE)
           END AS shared_frac,
           COALESCE(2*p.n_shared_tiles <= p.n_tiles, TRUE) AS keep
    FROM documents d LEFT JOIN perdoc p USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def frequent_segment_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop on corpus-frequent segment dominance — the
    CCNet paragraph-frequency dedup stage with fixed 8-token tiles as
    the segment unit (this corpus has no newlines/sentences). A doc is
    dropped when MORE THAN HALF its tiles occur in another document
    (integer comparison, no float in the decision); docs too short to
    tile (< 8 tokens) keep with zero counts. Shuffles: one by tile hash
    (doc-frequency), one by doc (per-doc fold), one left join back to
    the corpus keyed by doc — all linear in tile count. At sf0.01 the
    decision drops 47 of 500 docs (the generator's near-verbatim
    copies); both branches are exercised at every test scale."""
    d = load_table(spark, sf_dir, "documents")
    tiles = D.fixed_tile_profile(d, k=_TILE_K)
    freq = tiles.groupBy("tile_hash").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    perdoc = (
        tiles.join(freq, "tile_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tiles"),
            F.sum((F.col("ndocs") > 1).cast("long")).alias("n_shared_tiles"),
        )
    )
    return (
        d.select("doc_id")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tiles", F.lit(0)).alias("n_tiles"),
            F.coalesce("n_shared_tiles", F.lit(0)).alias("n_shared_tiles"),
            F.when(F.coalesce("n_tiles", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("n_shared_tiles").cast("double")
                / F.col("n_tiles").cast("double")
            )
            .alias("shared_frac"),
            F.coalesce(
                2 * F.col("n_shared_tiles") <= F.col("n_tiles"), F.lit(True)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "frequent_segment_removal",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    tiles AS (
      SELECT doc_id, i,
             array_to_string(t[(i*{_TILE_K}+1):(i*{_TILE_K}+{_TILE_K})], ' ') AS txt,
             md5(array_to_string(t[(i*{_TILE_K}+1):(i*{_TILE_K}+{_TILE_K})], ' ')) AS h
      FROM tok, unnest(range(0, CAST(floor(len(t)/{_TILE_K}) AS BIGINT))) AS u(i)
      WHERE len(t) >= {_TILE_K}
    ),
    freq AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM tiles GROUP BY h),
    kept AS (
      SELECT doc_id,
             CAST(COUNT(*) FILTER (WHERE f.ndocs = 1) AS BIGINT) AS n_kept_tiles,
             CAST(COUNT(*) FILTER (WHERE f.ndocs > 1) AS BIGINT) AS n_removed_tiles,
             list(txt ORDER BY i) FILTER (WHERE f.ndocs = 1) AS kept_txts
      FROM tiles JOIN freq f USING (h) GROUP BY doc_id
    ),
    rem AS (
      SELECT doc_id,
             CASE WHEN len(t) % {_TILE_K} = 0 THEN []
                  ELSE [array_to_string(
                    t[(CAST(floor(len(t)/{_TILE_K}) AS BIGINT)*{_TILE_K}+1):len(t)],
                    ' ')]
             END AS rem_part
      FROM tok
    )
    SELECT d.doc_id,
           COALESCE(k.n_kept_tiles, 0) AS n_kept_tiles,
           COALESCE(k.n_removed_tiles, 0) AS n_removed_tiles,
           COALESCE(array_to_string(
             list_concat(COALESCE(k.kept_txts, []), r.rem_part), ' '
           ), '') AS clean_text
    FROM documents d
    LEFT JOIN kept k USING (doc_id)
    JOIN rem r USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def frequent_segment_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL counterpart of frequent_segment_filter — rebuild each
    document with its corpus-frequent tiles cut out (the
    deduplicate-text-datasets / C4 span-removal action, at tile
    granularity): kept tiles in original order + the untiled remainder,
    re-joined in the normalized (lowercased, single-space) token
    space. A doc too short to tile passes through whole; a fully-shared
    doc collapses to its remainder. Per-doc reassembly is a bounded
    grouped fold (docs are bounded by the corpus's enforced
    chunked-input discipline — see winnowing's max_text_chars), sorted
    by tile index inside the aggregation buffer, never a global window.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = D.tokens_col("text")
    base = d.select(
        "doc_id", toks.alias("_t"), F.size(toks).alias("_n")
    )
    t = F.col("_t")
    k = _TILE_K
    tile_structs = F.transform(
        F.sequence(F.lit(0), (F.col("_n") / k).cast("long") - 1),
        lambda i: F.struct(
            i.alias("i"), F.array_join(F.slice(t, i * k + 1, k), " ").alias("txt")
        ),
    )
    tiles = (
        base.filter(F.col("_n") >= k)
        .select("doc_id", F.explode(tile_structs).alias("_s"))
        .select(
            "doc_id",
            F.col("_s.i").alias("i"),
            F.col("_s.txt").alias("txt"),
            F.md5(F.col("_s.txt")).alias("h"),
        )
    )
    freq = tiles.groupBy("h").agg(F.countDistinct("doc_id").alias("ndocs"))
    kept = (
        tiles.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("ndocs") == 1).cast("long")).alias("n_kept_tiles"),
            F.sum((F.col("ndocs") > 1).cast("long")).alias("n_removed_tiles"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("ndocs") == 1,
                        F.struct(F.col("i"), F.col("txt")),
                    )
                )
            ).alias("_kept_structs"),
        )
        .select(
            "doc_id",
            "n_kept_tiles",
            "n_removed_tiles",
            F.transform(F.col("_kept_structs"), lambda s: s["txt"]).alias(
                "kept_txts"
            ),
        )
    )
    rem = base.select(
        "doc_id",
        F.when(
            F.col("_n") % k == 0, F.array().cast("array<string>")
        )
        .otherwise(
            F.array(
                F.array_join(
                    F.slice(
                        t,
                        (F.col("_n") / k).cast("long") * k + 1,
                        F.col("_n") % k,
                    ),
                    " ",
                )
            )
        )
        .alias("rem_part"),
    )
    return (
        d.select("doc_id")
        .join(kept, "doc_id", "left")
        .join(rem, "doc_id")
        .select(
            "doc_id",
            F.coalesce("n_kept_tiles", F.lit(0)).alias("n_kept_tiles"),
            F.coalesce("n_removed_tiles", F.lit(0)).alias("n_removed_tiles"),
            F.array_join(
                F.concat(
                    F.coalesce(
                        F.col("kept_txts"), F.array().cast("array<string>")
                    ),
                    F.col("rem_part"),
                ),
                " ",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_cosine_incremental",
    oracle=rf"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
    tokc AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM corpus),
    tokb AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM batch),
    bgc AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS term
            FROM tokc, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
    bgb AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS term
            FROM tokb, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
    tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM bgc GROUP BY doc_id, term),
    tfb AS (SELECT doc_id, term, COUNT(*) AS tf FROM bgb GROUP BY doc_id, term),
    nc AS (SELECT doc_id, SUM(tf*tf) AS n2 FROM tfc GROUP BY doc_id
           HAVING SUM(tf*tf) <= {_COS_NORM_BOUND}),
    nb AS (SELECT doc_id, SUM(tf*tf) AS n2 FROM tfb GROUP BY doc_id
           HAVING SUM(tf*tf) <= {_COS_NORM_BOUND}),
    dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
    pc AS (SELECT doc_id, term FROM (
        SELECT tfc.doc_id, tfc.term,
               ROW_NUMBER() OVER (PARTITION BY tfc.doc_id
                                  ORDER BY dfc.df, tfc.term) AS rr
        FROM tfc JOIN dfc USING (term) WHERE dfc.df <= {_COS_DF_CAP}
      ) WHERE rr <= {_COS_PREFIX}),
    pb AS (SELECT doc_id, term FROM (
        SELECT tfb.doc_id, tfb.term,
               ROW_NUMBER() OVER (PARTITION BY tfb.doc_id
                                  ORDER BY COALESCE(dfc.df, 0), tfb.term) AS rr
        FROM tfb LEFT JOIN dfc USING (term)
        WHERE COALESCE(dfc.df, 0) <= {_COS_DF_CAP}
      ) WHERE rr <= {_COS_PREFIX}),
    ccand AS (SELECT DISTINCT pb.doc_id AS id_a, pc.doc_id AS id_b
              FROM pb JOIN pc USING (term)),
    cdots AS (SELECT c.id_a, c.id_b, SUM(a.tf*b.tf) AS dot FROM ccand c
              JOIN tfb a ON a.doc_id = c.id_a
              JOIN tfc b ON b.doc_id = c.id_b AND b.term = a.term
              GROUP BY c.id_a, c.id_b),
    dupc AS (SELECT DISTINCT d.id_a AS doc_id FROM cdots d
             JOIN nb ON nb.doc_id = d.id_a JOIN nc ON nc.doc_id = d.id_b
             WHERE d.dot*d.dot*25 >= 16*nb.n2*nc.n2),
    bcand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM pb a JOIN pb b USING (term) WHERE a.doc_id < b.doc_id),
    bdots AS (SELECT c.id_a, c.id_b, SUM(a.tf*b.tf) AS dot FROM bcand c
              JOIN tfb a ON a.doc_id = c.id_a
              JOIN tfb b ON b.doc_id = c.id_b AND b.term = a.term
              GROUP BY c.id_a, c.id_b),
    dupb AS (SELECT DISTINCT d.id_b AS doc_id FROM bdots d
             JOIN nb na ON na.doc_id = d.id_a JOIN nb ON nb.doc_id = d.id_b
             WHERE d.dot*d.dot*25 >= 16*na.n2*nb.n2)
    SELECT b.doc_id,
           CASE WHEN dc.doc_id IS NOT NULL THEN 'cosine_dup_corpus'
                WHEN db.doc_id IS NOT NULL THEN 'cosine_dup_batch'
                ELSE 'unique' END AS verdict
    FROM batch b
    LEFT JOIN dupc dc ON dc.doc_id = b.doc_id
    LEFT JOIN dupb db ON db.doc_id = b.doc_id
    ORDER BY b.doc_id
    """,
)
def dedup_cosine_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-increment classification with the lexical-cosine modality
    (operators.dedup.incremental_token_cosine_status): even-id docs are
    the accepted corpus, odd-id docs the arriving batch — a split that
    populates ALL THREE verdicts (cosine_dup_corpus / cosine_dup_batch /
    unique) at both test scales. Term doc-frequencies come from the
    CORPUS ONLY (the persisted index stat of a deployment — a gate
    cannot re-derive global df per batch); batch-only terms rank as
    df=0, maximally rare."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    return D.incremental_token_cosine_status(
        corpus,
        batch,
        ngram=2,
        rare_prefix=_COS_PREFIX,
        max_term_df=_COS_DF_CAP,
        threshold_num=4,
        threshold_den=5,
    ).orderBy("doc_id")
