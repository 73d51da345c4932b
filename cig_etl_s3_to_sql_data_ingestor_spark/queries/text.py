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
    score via per-(doc, char) partial aggregation plus a broadcast join
    against the quantized model (the map-literal fold was measured
    slower and rejected — see operators/text.py)."""
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


# Multimodal: the Spark path generates REAL PNG bytes (zlib IDAT, CRCs,
# per-row bpp-strided filters; grayscale/RGB/RGBA cycling doc_id % 3)
# and decodes them with a genuine pure-Python codec inside Arrow-batched
# mapInPandas (operators.multimodal). The oracles recompute every
# statistic from the generative pixel formula channel c of pixel (x, y)
# = (doc_id*31 + 7x + 13y + 19c) mod 256 — a decoder bug anywhere in
# the chunk/inflate/unfilter chain (including the multi-channel filter
# stride) is a value mismatch.
_SQL_MM_DIMS = """
      SELECT doc_id, 1 + n_chars % 64 AS w, 1 + (n_chars * 7) % 64 AS h,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS ch
      FROM documents
"""


@register(
    "multimodal_meta",
    oracle=f"""
    WITH m AS ({_SQL_MM_DIMS}
    ), px AS (
      SELECT m.doc_id,
             CAST(SUM((m.doc_id * 31 + 7 * t.x + 13 * u.y + 19 * v.c) % 256)
                  AS BIGINT) AS pixel_sum
      FROM m,
           unnest(generate_series(0, m.w - 1)) AS t(x),
           unnest(generate_series(0, m.h - 1)) AS u(y),
           unnest(generate_series(0, m.ch - 1)) AS v(c)
      GROUP BY m.doc_id
    )
    SELECT m.doc_id, 'png' AS format,
           CAST(m.w AS INTEGER) AS width,
           CAST(m.h AS INTEGER) AS height,
           CAST(m.ch AS INTEGER) AS n_channels,
           CAST(1 + m.doc_id % 8 AS INTEGER) AS n_frames,
           CAST(m.w * m.h * m.ch AS BIGINT) AS decoded_bytes,
           px.pixel_sum,
           CAST(px.pixel_sum AS DOUBLE) / (m.w * m.h * m.ch) AS mean_pixel
    FROM m JOIN px ON m.doc_id = px.doc_id
    ORDER BY m.doc_id
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.decode_image(M.attach_png(d)).orderBy("doc_id")


@register(
    "multimodal_resize",
    oracle=f"""
    WITH m AS ({_SQL_MM_DIMS}
    ), o AS (
      SELECT doc_id, w, h, ch,
             greatest(1, CAST(floor(w * least(1.0, 32.0 / greatest(w, h)))
                              AS BIGINT)) AS out_w,
             greatest(1, CAST(floor(h * least(1.0, 32.0 / greatest(w, h)))
                              AS BIGINT)) AS out_h
      FROM m
    ), px AS (
      SELECT o.doc_id,
             CAST(SUM((o.doc_id * 31 + 7 * ((t.x * o.w) // o.out_w)
                       + 13 * ((u.y * o.h) // o.out_h) + 19 * v.c) % 256)
                  AS BIGINT) AS rps
      FROM o,
           unnest(generate_series(0, o.out_w - 1)) AS t(x),
           unnest(generate_series(0, o.out_h - 1)) AS u(y),
           unnest(generate_series(0, o.ch - 1)) AS v(c)
      GROUP BY o.doc_id
    )
    SELECT o.doc_id,
           CAST(o.out_w AS INTEGER) AS out_width,
           CAST(o.out_h AS INTEGER) AS out_height,
           CAST(o.ch AS INTEGER) AS n_channels,
           CAST(o.out_w AS DOUBLE) / o.w AS scale_x,
           CAST(o.out_h AS DOUBLE) / o.h AS scale_y,
           CAST(o.out_w * o.out_h * o.ch AS BIGINT) AS resized_bytes,
           px.rps AS resized_pixel_sum
    FROM o JOIN px ON o.doc_id = px.doc_id
    ORDER BY o.doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.resize_image(M.attach_png(d), max_side=32).orderBy("doc_id")


@register(
    "multimodal_features",
    oracle=f"""
    WITH m AS ({_SQL_MM_DIMS}
    ), px AS (
      SELECT m.doc_id,
             (m.doc_id * 31 + 7 * t.x + 13 * u.y + 19 * v.c) % 256 AS v
      FROM m,
           unnest(generate_series(0, m.w - 1)) AS t(x),
           unnest(generate_series(0, m.h - 1)) AS u(y),
           unnest(generate_series(0, m.ch - 1)) AS v(c)
    ), agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bytes,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(MIN(v) AS INTEGER) AS min_pixel,
             CAST(MAX(v) AS INTEGER) AS max_pixel,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_pixels
      FROM px GROUP BY doc_id
    ), grad AS (
      SELECT m.doc_id,
             CAST(SUM(abs(
               (m.doc_id * 31 + 7 * (t.x + 1) + 13 * u.y + 19 * v.c) % 256
               - (m.doc_id * 31 + 7 * t.x + 13 * u.y + 19 * v.c) % 256))
                  AS BIGINT) AS g
      FROM m,
           unnest(generate_series(0, m.w - 2)) AS t(x),
           unnest(generate_series(0, m.h - 1)) AS u(y),
           unnest(generate_series(0, m.ch - 1)) AS v(c)
      GROUP BY m.doc_id
    )
    SELECT a.doc_id,
           CAST(m.w * m.h AS BIGINT) AS n_pixels,
           CAST(m.ch AS INTEGER) AS n_channels,
           CAST(a.s AS DOUBLE) / a.n_bytes AS mean_pixel,
           a.min_pixel, a.max_pixel, a.n_distinct_pixels,
           COALESCE(g.g, 0) AS grad_sum
    FROM agg a
    JOIN m ON m.doc_id = a.doc_id
    LEFT JOIN grad g ON a.doc_id = g.doc_id
    ORDER BY a.doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return M.image_features(M.attach_png(d)).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH m AS ({_SQL_MM_DIMS}
    ), fr AS (
      SELECT m.doc_id, m.w, m.h, m.ch,
             CAST(1 + m.doc_id % 8 AS INTEGER) AS n_frames,
             unnest(generate_series(0, CAST(m.doc_id % 8 AS INTEGER), 2))
               AS frame_idx
      FROM m
    ), px AS (
      SELECT fr.doc_id, fr.frame_idx,
             CAST(SUM((fr.doc_id * 31 + 7 * t.x + 13 * u.y + 19 * v.c
                       + 17 * fr.frame_idx) % 256) AS BIGINT) AS pixel_sum
      FROM fr,
           unnest(generate_series(0, fr.w - 1)) AS t(x),
           unnest(generate_series(0, fr.h - 1)) AS u(y),
           unnest(generate_series(0, fr.ch - 1)) AS v(c)
      GROUP BY fr.doc_id, fr.frame_idx
    )
    SELECT fr.doc_id, CAST(fr.frame_idx AS INTEGER) AS frame_idx,
           fr.n_frames,
           CAST(fr.w AS INTEGER) AS width, CAST(fr.h AS INTEGER) AS height,
           CAST(fr.ch AS INTEGER) AS n_channels,
           px.pixel_sum,
           CAST(px.pixel_sum AS DOUBLE) / (fr.w * fr.h * fr.ch) AS mean_pixel
    FROM fr JOIN px ON fr.doc_id = px.doc_id AND fr.frame_idx = px.frame_idx
    ORDER BY fr.doc_id, fr.frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 1-in-2 frame sampling over APNG payloads: per kept frame,
    stats computed from that frame's decoded (inflated + unfiltered)
    pixels — skipped frames never hit zlib. The oracle recomputes each
    frame's pixel sum from the generative formula (+17 per frame)."""
    d = load_table(spark, sf_dir, "documents")
    return M.sample_frames(M.attach_png(d), every_nth=2).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "audio_features",
    oracle="""
    WITH m AS (
      SELECT doc_id, 256 + (n_chars * 13) % 512 AS n,
             1 + doc_id % 2 AS ch
      FROM documents
    ), s AS (
      SELECT m.doc_id, m.n, m.ch, t.i, u.c,
             ((m.doc_id * 7919 + t.i * 2654435761 + 97 * u.c) % 65536)
               - 32768 AS v
      FROM m,
           unnest(generate_series(0, m.n - 1)) AS t(i),
           unnest(generate_series(0, m.ch - 1)) AS u(c)
    ), agg AS (
      SELECT doc_id,
             CAST(SUM(v * v) AS BIGINT) AS sum_sq,
             CAST(MAX(abs(v)) AS BIGINT) AS peak
      FROM s GROUP BY doc_id
    ), zc AS (
      SELECT a.doc_id, CAST(COUNT(*) FILTER (WHERE a.v * b.v < 0) AS BIGINT)
               AS zero_crossings
      FROM s a JOIN s b
        ON a.doc_id = b.doc_id AND a.c = b.c AND b.i = a.i + 1
      GROUP BY a.doc_id
    )
    SELECT m.doc_id, CAST(8000 AS INTEGER) AS sample_rate,
           CAST(m.ch AS INTEGER) AS n_channels,
           CAST(m.n AS BIGINT) AS n_samples,
           CAST((m.n * 1000) // 8000 AS BIGINT) AS duration_ms,
           agg.peak, agg.sum_sq,
           sqrt(CAST(agg.sum_sq AS DOUBLE) / (m.n * m.ch)) AS rms,
           zc.zero_crossings
    FROM m
    JOIN agg ON agg.doc_id = m.doc_id
    JOIN zc ON zc.doc_id = m.doc_id
    ORDER BY m.doc_id
    """,
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: RIFF/WAVE PCM16 payloads parsed chunk-by-chunk,
    clip statistics from the decoded samples (integer accumulators; one
    final sqrt). The oracle recomputes everything from the generative
    sample formula — a parser bug is a value mismatch."""
    d = load_table(spark, sf_dir, "documents")
    return M.audio_features(M.attach_wav(d)).orderBy("doc_id")


@register(
    "char_entropy",
    oracle=f"""
    WITH ch AS (
      SELECT doc_id, unnest({_SQL_CHARS}) AS c FROM documents
    ), per AS (
      SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY doc_id, c
    ), tot AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS distinct_chars
      FROM per GROUP BY doc_id
    ), q AS (
      SELECT per.doc_id, per.cnt, tot.t, tot.distinct_chars,
             CAST(floor(ln(CAST(per.cnt AS DOUBLE) / CAST(tot.t AS DOUBLE))
                        * {TX.LM_QUANT}) AS BIGINT) AS qlogp
      FROM per JOIN tot ON per.doc_id = tot.doc_id
    )
    SELECT doc_id,
           t AS n_chars_counted,
           distinct_chars,
           CAST(-SUM(cnt * qlogp) AS BIGINT) AS entropy_q,
           CAST(-SUM(cnt * qlogp) AS DOUBLE) / (t * {TX.LM_QUANT}) AS entropy_nats
    FROM q GROUP BY doc_id, t, distinct_chars ORDER BY doc_id
    """,
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy in quantized milli-nats — the
    corpus-independent degeneracy signal complementing surprisal (see
    operators/text.char_entropy)."""
    d = load_table(spark, sf_dir, "documents")
    return TX.char_entropy(d).orderBy("doc_id")


@register(
    "image_ahash_groups",
    oracle=f"""
    WITH m AS ({_SQL_MM_DIMS}
    ), g AS (
      SELECT m.doc_id, t.i, u.j,
             CAST(SUM((m.doc_id * 31 + 7 * ((t.i * m.w) // 8)
                       + 13 * ((u.j * m.h) // 8) + 19 * v.c) % 256)
                  AS BIGINT) AS v
      FROM m,
           unnest(generate_series(0, 7)) AS t(i),
           unnest(generate_series(0, 7)) AS u(j),
           unnest(generate_series(0, m.ch - 1)) AS v(c)
      GROUP BY m.doc_id, t.i, u.j
    ), s AS (
      SELECT doc_id, CAST(SUM(v) AS BIGINT) AS total FROM g GROUP BY doc_id
    ), bits AS (
      SELECT g.doc_id,
             string_agg(CASE WHEN g.v * 64 >= s.total THEN '1' ELSE '0' END,
                        '' ORDER BY g.j, g.i) AS ahash
      FROM g JOIN s USING (doc_id) GROUP BY g.doc_id
    ), sizes AS (
      SELECT ahash, COUNT(*) AS cnt FROM bits GROUP BY ahash
    )
    SELECT b.doc_id, b.ahash, CAST(z.cnt AS BIGINT) AS group_size
    FROM bits b JOIN sizes z USING (ahash)
    ORDER BY b.doc_id
    """,
)
def image_ahash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup signatures from REAL decoded pixels: per-doc
    64-bit average-hash (integer-thresholded 8x8 lattice) plus the size
    of its exact-hash group — the grouping a multimodal dedup pass runs
    before pairwise verification. The oracle recomputes every hash from
    the generative pixel formula, so a decoder or sampling bug flips
    bits and fails the value hash."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    hashes = M.image_ahash(M.attach_png(d))
    sizes = hashes.groupBy("ahash").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        hashes.join(sizes, "ahash")
        .select("doc_id", "ahash", "group_size")
        .orderBy("doc_id")
    )


@register(
    "audio_fingerprint_groups",
    oracle="""
    WITH m AS (
      SELECT doc_id, 256 + (n_chars * 13) % 512 AS n,
             1 + doc_id % 2 AS ch
      FROM documents
    ), s AS (
      SELECT m.doc_id, m.n, t.i,
             ((m.doc_id * 7919 + t.i * 2654435761 + 97 * u.c) % 65536)
               - 32768 AS v
      FROM m,
           unnest(generate_series(0, m.n - 1)) AS t(i),
           unnest(generate_series(0, m.ch - 1)) AS u(c)
    ), win AS (
      SELECT doc_id, (i * 32) // n AS w, CAST(SUM(v * v) AS BIGINT) AS e
      FROM s GROUP BY doc_id, (i * 32) // n
    ), tot AS (
      SELECT doc_id, CAST(SUM(e) AS BIGINT) AS total FROM win GROUP BY doc_id
    ), fp AS (
      SELECT win.doc_id,
             string_agg(CASE WHEN win.e * 32 >= tot.total THEN '1' ELSE '0' END,
                        '' ORDER BY win.w) AS fingerprint
      FROM win JOIN tot USING (doc_id) GROUP BY win.doc_id
    ), sizes AS (
      SELECT fingerprint, COUNT(*) AS cnt FROM fp GROUP BY fingerprint
    )
    SELECT f.doc_id, f.fingerprint, CAST(z.cnt AS BIGINT) AS group_size
    FROM fp f JOIN sizes z USING (fingerprint)
    ORDER BY f.doc_id
    """,
)
def audio_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup signatures from REAL decoded PCM: per-clip 32-bit
    energy-profile fingerprint plus its exact-group size — the audio
    twin of image_ahash_groups. Oracle recomputes every fingerprint
    from the generative sample formula."""
    d = load_table(spark, sf_dir, "documents")
    fp = M.audio_fingerprint(M.attach_wav(d))
    sizes = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        fp.join(sizes, "fingerprint")
        .select("doc_id", "fingerprint", "group_size")
        .orderBy("doc_id")
    )


@register(
    "curation_decisions",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text, length(text) AS n_chars, len({SQL_TOKENS}) AS n_tokens,
             len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
             {_EN} AS stop_hits
      FROM documents
    ), q AS (
      SELECT doc_id, text, n_tokens,
             least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
               + least(CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 4, 1.0) * 0.4
               + (1 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10, 1.0)) * 0.2
               AS quality_score
      FROM s
    ), keepers AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keeper
      FROM documents GROUP BY md5(text)
    ), tagged AS (
      SELECT q.doc_id, q.n_tokens, q.quality_score,
             CASE WHEN q.doc_id <> k.keeper THEN 'exact_dup'
                  WHEN q.quality_score < 0.5 THEN 'low_quality'
                  ELSE 'keep' END AS reason
      FROM q JOIN keepers k ON md5(q.text) = k.h
    )
    SELECT doc_id,
           CASE WHEN reason = 'keep' THEN 'keep' ELSE 'drop' END AS decision,
           reason, CAST(n_tokens AS BIGINT) AS n_tokens, quality_score
    FROM tagged ORDER BY doc_id
    """,
)
def curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition: one keep/drop decision per document
    with the FIRST failing rule as the reason — exact-duplicate losers
    (md5 grouping, lowest id is canonical) drop first, then documents
    below the quality floor (0.5, the same constant the streaming
    monitor pages on), everything else keeps. This is the decision
    frame a training-data pipeline materializes before writing shards;
    each rule reuses the already-proven operator (exact dedup's
    digest grouping, the quality scorer) so the composed query costs
    one digest aggregate + one quality projection + one broadcast-sized
    join — no new shuffle shapes.
    """
    d = load_table(spark, sf_dir, "documents")
    q = TX.quality_scores(d).select("doc_id", "n_tokens", "quality_score")
    keepers = (
        d.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"))
    )
    tagged = (
        d.select("doc_id", F.md5("text").alias("h"))
        .join(keepers, "h")
        .join(q, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            F.when(F.col("doc_id") != F.col("keeper"), F.lit("exact_dup"))
            .when(F.col("quality_score") < 0.5, F.lit("low_quality"))
            .otherwise(F.lit("keep"))
            .alias("reason"),
        )
    )
    return tagged.select(
        "doc_id",
        F.when(F.col("reason") == "keep", F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("decision"),
        "reason",
        "n_tokens",
        "quality_score",
    ).orderBy("doc_id")


# --- Gopher rule filter + MOSS winnowing (round 7) --------------------------

_GOPHER_STOPS = ", ".join(f"'{w}'" for w in TX.GOPHER_STOPWORDS)

# Shared Gopher-rule CTE fragments (reused by the curation_pipeline
# oracle — ONE spelling, so a rule tweak cannot desync the two).
_GOPHER_FEATURES = f"""
    s AS (
      SELECT doc_id, text, {SQL_TOKENS} AS toks FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(length(array_to_string(toks, ' ')) - (len(toks) - 1)
                  AS BIGINT) AS sum_len,
             CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                  AS BIGINT) AS alpha_toks,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\\.\\.\\.'))
                  AS BIGINT) AS symbols,
             CAST(len(list_filter(toks,
                  t -> list_contains([{_GOPHER_STOPS}], t)))
                  AS BIGINT) AS stop_hits
      FROM s
    )
"""
_GOPHER_PASS = """((n_tokens >= 50 AND n_tokens <= 100000)
            AND (sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens)
            AND (10 * symbols < n_tokens)
            AND (5 * alpha_toks >= 4 * n_tokens)
            AND (stop_hits >= 2))"""


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH {_GOPHER_FEATURES}
    SELECT doc_id, n_tokens,
           (n_tokens >= 50 AND n_tokens <= 100000) AS word_count_ok,
           (sum_len >= 3 * n_tokens AND sum_len <= 10 * n_tokens)
             AS mean_word_len_ok,
           (10 * symbols < n_tokens) AS symbol_ratio_ok,
           (5 * alpha_toks >= 4 * n_tokens) AS alpha_ratio_ok,
           (stop_hits >= 2) AS stopword_ok,
           {_GOPHER_PASS} AS passes_gopher
    FROM f ORDER BY doc_id
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021 §A1.1) at the
    paper's word-level defaults — per-rule booleans plus the pass
    verdict, the audit table a curation run keeps next to the filtered
    corpus. Integer-exact: every ratio rule is cross-multiplied."""
    d = load_table(spark, sf_dir, "documents")
    return TX.gopher_rules(d).orderBy("doc_id")


# Shared winnowing CTE: per-doc k-gram md5 sequence (k=5) and the
# rightmost-min selected positions over w=4 windows.
_WINNOW_SEL = """
    h AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(length(lower(text)) - 4, 1)),
               i -> md5(substr(lower(text), i, 5))
             ) AS hs
      FROM documents
    ),
    w AS (SELECT doc_id, hs, len(hs) AS n FROM h),
    sel AS (
      SELECT doc_id, hs,
             list_distinct(list_transform(
               generate_series(1, greatest(n - 3, 1)),
               j -> list_max(list_filter(
                      generate_series(j, least(j + 3, n)),
                      i -> hs[i] = list_min(hs[j:least(j + 3, n)])))
             )) AS ps
      FROM w
    )
"""


@register(
    "winnowing_sites",
    oracle=f"""
    WITH {_WINNOW_SEL},
    x AS (SELECT doc_id, hs, unnest(ps) AS p FROM sel)
    SELECT doc_id, CAST(p AS BIGINT) AS pos, hs[p] AS fingerprint
    FROM x WHERE doc_id % 10 = 0 ORDER BY doc_id, pos
    """,
)
def winnowing_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing selected sites (position + fingerprint) for a
    deterministic 10% doc slice — the site-level view that pins the
    rightmost-minimum tie rule and the ~2/(w+1) density guarantee."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 10) == 0
    )
    return TX.winnowing_fingerprints(d).orderBy("doc_id", "pos")


@register(
    "winnowing_groups",
    oracle=f"""
    WITH {_WINNOW_SEL},
    x AS (SELECT doc_id, hs, unnest(ps) AS p FROM sel),
    sites AS (SELECT doc_id, hs[p] AS fingerprint FROM x)
    SELECT fingerprint,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sites,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM sites GROUP BY fingerprint HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, fingerprint LIMIT 100
    """,
)
def winnowing_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document winnowing fingerprint groups: selected hashes
    shared by >= 2 documents — the match-candidate index MOSS builds.
    Grouping runs over the SELECTED sites (~2/(w+1) of shingles), so
    the shuffle is the sparse digest, never the corpus text."""
    d = load_table(spark, sf_dir, "documents")
    sites = TX.winnowing_fingerprints(d)
    return (
        sites.groupBy("fingerprint")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_sites"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "fingerprint")
        .limit(100)
    )


@register(
    "winnowing_matches",
    oracle=f"""
    WITH {_WINNOW_SEL},
    x AS (SELECT doc_id, hs, unnest(ps) AS p FROM sel),
    fp AS (SELECT DISTINCT doc_id, hs[p] AS f FROM x),
    keep AS (
      SELECT f FROM fp GROUP BY f
      HAVING COUNT(*) >= 2 AND COUNT(*) <= 20
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fp a JOIN keep USING (f) JOIN fp b USING (f)
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM pairs GROUP BY id_a, id_b
    ORDER BY n_shared DESC, id_a, id_b LIMIT 50
    """,
)
def winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match report: top document pairs by count of shared
    selected fingerprints (boilerplate k-grams in > 20 docs excluded
    by declared semantics) — the pairwise plagiarism/near-dup evidence
    the winnowing index exists to produce."""
    d = load_table(spark, sf_dir, "documents")
    return (
        TX.winnowing_matches(d, max_group=20)
        .orderBy(F.col("n_shared").desc(), "id_a", "id_b")
        .limit(50)
    )


@register(
    "curation_pipeline",
    oracle=f"""
    WITH {_GOPHER_FEATURES},
    {_WINNOW_SEL},
    x AS (SELECT doc_id, hs, unnest(ps) AS p FROM sel),
    fp AS (SELECT DISTINCT doc_id, hs[p] AS f FROM x),
    keep_f AS (
      SELECT f FROM fp GROUP BY f
      HAVING COUNT(*) >= 2 AND COUNT(*) <= 20
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fp a JOIN keep_f USING (f) JOIN fp b USING (f)
      WHERE a.doc_id < b.doc_id GROUP BY id_a, id_b
    ),
    dup AS (SELECT DISTINCT id_b AS doc_id FROM pairs WHERE n_shared >= 3),
    g AS (SELECT doc_id, {_GOPHER_PASS} AS ok FROM f)
    SELECT d.doc_id, d.source,
           CASE WHEN NOT g.ok THEN 'drop'
                WHEN dup.doc_id IS NOT NULL THEN 'drop'
                ELSE 'keep' END AS decision,
           CASE WHEN NOT g.ok THEN 'gopher_fail'
                WHEN dup.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'keep' END AS reason
    FROM documents d
    JOIN g USING (doc_id)
    LEFT JOIN dup USING (doc_id)
    ORDER BY doc_id
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 curation capstone: one keep/drop decision per document
    with the FIRST failing stage as the reason, composing the round's
    proven operators the way a production curation pass chains them —
    Gopher rule filter first (cheap map-only projection prunes before
    any pair work), then winnowing near-dup eviction (a document
    sharing >= 3 selected fingerprints with any EARLIER document drops;
    earliest id is the keeper, the same keep-first discipline as
    dedup_exact). Rule precedence is declared: a doc failing Gopher
    reports 'gopher_fail' even if it is also a near-duplicate.

    Scale: the Gopher stage is scan-pipelined; the pair stage is
    winnowing_matches' bounded join strategy; the decision join is
    keyed by doc_id. Nothing here exceeds the component operators'
    audited shapes.
    """
    d = load_table(spark, sf_dir, "documents")
    gopher = TX.gopher_rules(d).select("doc_id", "passes_gopher")
    dup = (
        TX.winnowing_matches(d, max_group=20)
        .filter(F.col("n_shared") >= 3)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_is_dup", F.lit(True))
    )
    return (
        d.select("doc_id", "source")
        .join(gopher, "doc_id")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(~F.col("passes_gopher"), F.lit("drop"))
            .when(F.col("_is_dup"), F.lit("drop"))
            .otherwise(F.lit("keep"))
            .alias("decision"),
            F.when(~F.col("passes_gopher"), F.lit("gopher_fail"))
            .when(F.col("_is_dup"), F.lit("near_dup"))
            .otherwise(F.lit("keep"))
            .alias("reason"),
        )
        .orderBy("doc_id")
    )


@register(
    "dataset_report",
    oracle=f"""
    WITH {_GOPHER_FEATURES},
    gsum AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(COALESCE(f.n_tokens, 0)) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN {_GOPHER_PASS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_gopher_pass
      FROM f JOIN documents d USING (doc_id) GROUP BY d.source
    ),
    dg AS (SELECT doc_id, source, md5(text) AS h FROM documents),
    duph AS (SELECT h FROM dg GROUP BY h HAVING COUNT(*) > 1),
    dups AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dup_docs
      FROM dg JOIN duph USING (h) GROUP BY source
    ),
    vocab AS (
      SELECT source, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_distinct_tokens
      FROM (SELECT source, unnest({SQL_TOKENS}) AS t FROM documents)
      GROUP BY source
    ),
    lang_pred AS (
      SELECT doc_id, source,
             CASE WHEN {_EN} >= {_DE} AND {_EN} >= {_FR} AND {_EN} > 0 THEN 'en'
                  WHEN {_DE} >= {_FR} AND {_DE} > 0 THEN 'de'
                  WHEN {_FR} > 0 THEN 'fr'
                  ELSE 'unk' END AS predicted_lang
      FROM documents
    ),
    lang_counts AS (
      SELECT source, predicted_lang, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, predicted_lang)
               AS rk
      FROM lang_pred GROUP BY source, predicted_lang
    )
    SELECT g.source, g.n_docs, g.n_tokens,
           COALESCE(v.n_distinct_tokens, 0) AS n_distinct_tokens,
           COALESCE(dp.n_dup_docs, 0) AS n_dup_docs,
           CAST(COALESCE(dp.n_dup_docs, 0) AS DOUBLE)
             / CAST(g.n_docs AS DOUBLE) AS dup_rate,
           g.n_gopher_pass,
           CAST(g.n_gopher_pass AS DOUBLE) / CAST(g.n_docs AS DOUBLE)
             AS gopher_pass_rate,
           lc.predicted_lang AS majority_lang
    FROM gsum g
    LEFT JOIN vocab v USING (source)
    LEFT JOIN dups dp USING (source)
    JOIN (SELECT source, predicted_lang FROM lang_counts WHERE rk = 1) lc
      USING (source)
    ORDER BY source
    """,
)
def dataset_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: one row per source with the statistics every
    corpus release ships — doc/token counts, exact vocabulary size,
    exact-duplicate rate (corpus-wide digest groups attributed back to
    each source), Gopher rule pass rate, and the majority predicted
    language. Composes the proven digest-dedup, Gopher, and lang-id
    operators; every rate is a single integer/integer division.

    Scale: four independent per-source aggregates joined on the tiny
    source key — one digest shuffle, one (source, token)-distinct
    shuffle, one map-only Gopher pass, one lang projection; nothing
    pairwise, no global window (the lang majority window partitions by
    source over a #sources x #langs frame).
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    g = TX.gopher_rules(d, keep=("source",))
    gsum = g.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        # NULL text tokenizes to a NULL array: size() is -1 in Spark,
        # NULL in SQL — the card counts such docs as 0 tokens on both.
        F.sum(F.greatest(F.col("n_tokens"), F.lit(0).cast("long")))
        .cast("long")
        .alias("n_tokens"),
        F.sum(F.col("passes_gopher").cast("int"))
        .cast("long")
        .alias("n_gopher_pass"),
    )
    dg = d.select("doc_id", "source", F.md5("text").alias("h"))
    duph = dg.groupBy("h").agg(F.count("*").alias("_n")).filter(
        F.col("_n") > 1
    ).select("h")
    dups = (
        dg.join(duph, "h")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_dup_docs"))
    )
    from ..operators.dedup import tokens_col

    vocab = (
        d.select("source", F.explode(tokens_col("text")).alias("t"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_distinct_tokens"))
    )
    langs = (
        TX.language_id(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source", "predicted_lang")
        .agg(F.count("*").alias("_n"))
    )
    w = W.partitionBy("source").orderBy(
        F.col("_n").desc(), F.col("predicted_lang")
    )
    majority = (
        langs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("source", F.col("predicted_lang").alias("majority_lang"))
    )
    return (
        # vocab LEFT: a source whose documents all have NULL text
        # yields no vocab rows (explode drops NULL arrays) — it must
        # still appear on the card with n_distinct_tokens=0, not
        # vanish (one row per source is the contract). majority stays
        # inner: lang_id emits 'unk' for every doc, so it covers all
        # sources by construction.
        gsum.join(vocab, "source", "left")
        .join(dups, "source", "left")
        .join(majority, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.coalesce(
                F.col("n_distinct_tokens"), F.lit(0).cast("long")
            ).alias("n_distinct_tokens"),
            F.coalesce(F.col("n_dup_docs"), F.lit(0).cast("long")).alias(
                "n_dup_docs"
            ),
            (
                F.coalesce(F.col("n_dup_docs"), F.lit(0)).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
            "n_gopher_pass",
            (
                F.col("n_gopher_pass").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("gopher_pass_rate"),
            "majority_lang",
        )
        .orderBy("source")
    )
