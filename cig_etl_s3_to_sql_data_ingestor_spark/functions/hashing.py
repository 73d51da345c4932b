"""Deterministic md5-based hash bucketing — THE one spelling.

Spark's built-in ``hash``/``xxhash64`` are version-pinned implementation
details; md5 over the stringified id is stable across engines and
versions, which is what lets a DuckDB oracle reproduce every sampling /
split / batching decision bit-for-bit. The SQL mirror is the
strpos-polynomial hex decode (``queries.corpus._SQL_BUCKET`` and
siblings).

NOTE: the same expression currently also appears inline in
``operators/similarity.py`` (kmeans sample), ``operators/corpus_prep.py``,
``queries/llmprep.py`` and ``queries/corpus.py`` — all written before
this helper. They are bit-identical by construction and pinned by their
oracles; consolidate them onto this helper next time their modules are
touched (a no-op refactor here would reset their untouched-since-green
rotation status for no behavior change).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(col: Column, mod: int) -> Column:
    """Uniform bucket in [0, mod): first 6 md5 hex digits of the
    stringified value, decoded base-16, mod ``mod``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("long")
        % mod
    )


def sql_md5_int6(arg: str) -> str:
    """SQL mirror of the raw 6-hex-digit md5 integer in [0, 16^6):
    the strpos-polynomial decode WITHOUT the mod — the uniform-draw
    source for the weighted-sampling key (Efraimidis–Spirakis)."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({arg}), {i + 1}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"({digits})"


def sql_md5_mod(arg: str, mod: int) -> str:
    """The ANSI/DuckDB mirror of :func:`md5_bucket` for an arbitrary
    string expression: strpos-polynomial decode of md5's first 6 hex
    digits, mod. One canonical spelling — the query-module oracles
    (corpus split buckets, CMS cells, bloom bits, IVF sampling) must
    all call this, or a tweak to the hashing spelling silently desyncs
    an oracle from the Spark-side function."""
    return f"({sql_md5_int6(arg)} % {mod})"
