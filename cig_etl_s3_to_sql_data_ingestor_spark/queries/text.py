"""Text-analysis + multimodal query surface over ``documents``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import multimodal as M
from ..operators import text as TX

QUERIES = {}
ORACLES = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


SQL_TOKENS = r"regexp_split_to_array(lower(trim(text)), '\s+')"
SQL_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _sql_stop_hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({SQL_TOKENS}, t -> list_contains([{lst}], t)))"


@register(
    "token_count",
    oracle=f"""
    SELECT doc_id, length(text) AS n_chars,
           len({SQL_TOKENS}) AS n_tokens,
           len(regexp_extract_all(text, '{SQL_BPE}')) AS n_subtokens
    FROM documents ORDER BY doc_id
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.token_stats(d).orderBy("doc_id")


_EN = _sql_stop_hits(TX.STOPWORDS["en"])
_DE = _sql_stop_hits(TX.STOPWORDS["de"])
_FR = _sql_stop_hits(TX.STOPWORDS["fr"])


@register(
    "quality_score",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, length(text) AS n_chars, len({SQL_TOKENS}) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             {_EN} AS stop_hits
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
           CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
           CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
           least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
             + least(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 4, 1.0) * 0.4
             + (1 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10, 1.0)) * 0.2
             AS quality_score
    FROM s ORDER BY doc_id
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.quality_scores(d).orderBy("doc_id")


@register(
    "lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_EN} AS hits_en, {_DE} AS hits_de, {_FR} AS hits_fr
      FROM documents
    )
    SELECT doc_id, hits_en, hits_de, hits_fr,
           CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
                WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
                WHEN hits_fr > 0 THEN 'fr'
                ELSE 'unk' END AS predicted_lang
    FROM s ORDER BY doc_id
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.language_id(d).orderBy("doc_id")


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(
             generate_series(1, greatest(length(lower(text)) - 4, 1)),
             i -> md5(substr(lower(text), i, 5))
           )) AS fingerprint,
           len(generate_series(1, greatest(length(lower(text)) - 4, 1))) AS n_shingles
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return TX.fingerprints(d).orderBy("doc_id")


@register(
    "repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ), b AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bg
      FROM t
    )
    SELECT doc_id, len(toks) AS n_tokens,
           CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
             AS dup_token_frac,
           CAST(list_max(list_transform(list_distinct(toks),
                  u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE) / len(toks)
             AS top_token_frac,
           CASE WHEN len(bg) > 0 THEN
             CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) END
             AS dup_bigram_frac,
           CASE WHEN len(bg) > 0 THEN
             CAST(list_max(list_transform(list_distinct(bg),
                    u -> len(list_filter(bg, x -> x = u)))) AS DOUBLE) / len(bg) END
             AS top_bigram_frac
    FROM b ORDER BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals: duplicate-token
    fraction, top-token mass, duplicate/top bigram fractions."""
    d = load_table(spark, sf_dir, "documents")
    return TX.repetition_stats(d).orderBy("doc_id")


_SQL_CHARS = "regexp_extract_all(lower(text), '.')"


@register(
    "char_lm_surprisal",
    oracle=f"""
    WITH ch AS (
      SELECT doc_id, unnest({_SQL_CHARS}) AS c FROM documents
    ), model AS (
      SELECT c AS ch, COUNT(*) AS n_occ FROM ch GROUP BY c
    ), tot AS (
      SELECT CAST(SUM(n_occ) AS BIGINT) AS total FROM model
    ), q AS (
      SELECT ch,
             CAST(floor(ln(CAST(n_occ AS DOUBLE) / CAST(total AS DOUBLE))
                        * {TX.LM_QUANT}) AS BIGINT) AS qlogp
      FROM model, tot
    ), per AS (
      SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY doc_id, c
    ), agg AS (
      SELECT per.doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_chars_scored,
             CAST(-SUM(cnt * qlogp) AS BIGINT) AS surprisal_q
      FROM per JOIN q ON per.c = q.ch GROUP BY per.doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_chars_scored, 0) AS n_chars_scored,
           COALESCE(a.surprisal_q, 0) AS surprisal_q,
           CAST(COALESCE(a.surprisal_q, 0) AS DOUBLE)
             / COALESCE(a.n_chars_scored, 0) AS mean_surprisal
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id
    """,
)
def char_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-unigram LM surprisal per document (perplexity-bucket
    stand-in): train integer-quantized log-probs on the corpus, then
    score every document with a zero-shuffle map-literal fold."""
    d = load_table(spark, sf_dir, "documents")
    model = TX.char_lm_model(d)
    return TX.char_lm_score(d, model).orderBy("doc_id")


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, {_EN} AS hits_en, {_DE} AS hits_de, {_FR} AS hits_fr
      FROM documents
    ), pred AS (
      SELECT lang,
             CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
                  WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
                  WHEN hits_fr > 0 THEN 'fr'
                  ELSE 'unk' END AS predicted_lang
      FROM s
    )
    SELECT lang, predicted_lang, COUNT(*) AS n
    FROM pred GROUP BY lang, predicted_lang
    ORDER BY lang, predicted_lang
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic-vs-ground-truth confusion matrix: the labeled ``lang``
    column joined against the stopword-hit prediction — the quality
    check a corpus pipeline runs on its own language filter."""
    d = load_table(spark, sf_dir, "documents")
    pred = TX.language_id(d).select("doc_id", "predicted_lang")
    return (
        d.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted_lang")
    )


# Multimodal plumbing: the Spark path runs a REAL Arrow-batched mapInPandas
# decode (with a deterministic fake codec — see operators.multimodal); the
# oracle reproduces the same deterministic outputs in SQL.
@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format,
           CAST(1 + n_chars % 64 AS INTEGER) AS width,
           CAST(1 + (n_chars * 7) % 64 AS INTEGER) AS height,
           CAST(1 + doc_id % 8 AS INTEGER) AS n_frames,
           octet_length(encode(text)) AS decoded_bytes
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.decode_stub(M.attach_payload(d)).orderBy("doc_id")


@register(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             1 + n_chars % 64 AS w,
             1 + (n_chars * 7) % 64 AS h,
             octet_length(encode(text)) AS nb
      FROM documents
    ), s AS (
      SELECT doc_id, w, h, nb, least(1.0, 32.0 / greatest(w, h)) AS scale FROM m
    ), o AS (
      SELECT doc_id, w, h, nb,
             greatest(1, CAST(floor(w * scale) AS BIGINT)) AS out_w,
             greatest(1, CAST(floor(h * scale) AS BIGINT)) AS out_h
      FROM s
    )
    SELECT doc_id,
           CAST(out_w AS INTEGER) AS out_width,
           CAST(out_h AS INTEGER) AS out_height,
           CAST(out_w AS DOUBLE) / w AS scale_x,
           CAST(out_h AS DOUBLE) / h AS scale_y,
           nb * out_w * out_h // (w * h) AS resized_bytes
    FROM o ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.resize_stub(M.attach_payload(d), max_side=32).orderBy("doc_id")


@register(
    "multimodal_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, ascii(substr(text, i, 1)) AS byte
      FROM documents, unnest(generate_series(1, length(text))) AS t(i)
    ), hist AS (
      SELECT doc_id, byte, COUNT(*) AS cnt FROM b GROUP BY doc_id, byte
    ), agg AS (
      SELECT doc_id, SUM(cnt * byte) AS byte_sum, SUM(cnt) AS n,
             list(cnt ORDER BY byte) AS counts
      FROM hist GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(byte_sum AS DOUBLE) / n AS mean_byte,
           -(list_reduce(
               list_transform(counts,
                 c -> (CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)),
               (a, x) -> a + x
             )) AS byte_entropy,
           CAST(n AS BIGINT) AS n_bytes
    FROM agg ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.feature_extract_stub(M.attach_payload(d)).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format,
           unnest(generate_series(0, CAST(doc_id % 8 AS INTEGER), 2)) AS frame_idx
    FROM documents ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.frame_sample_plan(M.attach_payload(d)).orderBy("doc_id", "frame_idx")
