"""Named query surface: every implemented operator from SURVEY.md §2 (plus
the LLM-data-pipeline extensions) exposed as ``(spark, sf_dir) -> DataFrame``
callables, each paired with an ANSI-SQL oracle runnable by DuckDB on the
same parquet tables.

Registries are merged from the sub-modules; ``__spark_entry__`` re-exports
them for the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics, core, corpus, dedup, text, vectors

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (analytics, core, corpus, dedup, text, vectors):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
