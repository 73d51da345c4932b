"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of the reference S3-to-SQL ingestor (jazz0829/
cig-etl-s3-to-sql-data-ingestor), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, arrow).
- ``io``         : table loading helpers for the synthetic test tables.
- ``catalog``    : config-declared table registry (ordered-column contract).
- ``operators``  : transform pipeline (T1-T12), dedup, similarity, text,
                   multimodal — each designed to scale (no driver collects,
                   broadcast small sides, JVM-side expressions).
- ``sources``    : partitioned parquet-tree discovery, JDBC, S3 listing.
- ``plans``      : work-list construction (config joins + pruning + marker
                   anti-join) — the reference's "query plan".
- ``streaming``  : Structured Streaming ingest (availableNow + foreachBatch).
- ``queries``    : the named query surface wired into ``__spark_entry__``.
"""

__version__ = "0.1.0"

# Public API: the pieces a user of the reference ingestor needs to switch.
from .catalog import ColumnSpec, TableSpec, load_catalog  # noqa: E402,F401
from .notify import CollectingNotifier, WebhookNotifier  # noqa: E402,F401
from .partitioning import fan_out, salted_join  # noqa: E402,F401
from .pipeline import BatchIngest, IngestResult  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
from .sql import register_views, sql  # noqa: E402,F401

__all__ = [
    "BatchIngest",
    "CollectingNotifier",
    "ColumnSpec",
    "IngestResult",
    "TableSpec",
    "WebhookNotifier",
    "fan_out",
    "get_spark",
    "load_catalog",
    "register_views",
    "salted_join",
    "sql",
]
