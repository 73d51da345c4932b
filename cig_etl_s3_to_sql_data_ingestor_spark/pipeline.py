"""End-to-end batch ingest: the Spark-native equivalent of the
reference's `main.py` lifecycle (SURVEY.md §3.1).

    discover (S2/S3) → work-list plan (P2-P6, J4) → per-group:
    read parquet (S1) → stringify → clean T1-T11 + P1 → T12 →
    sink (parquet or JDBC) → marker touch

Differences from the reference, by design:
- one Spark job per (environment, entity) group instead of one OS
  process per file — Spark's task parallelism replaces luigi's 10
  workers, and small files coalesce into sane partitions automatically;
- the transform is a column-expression pipeline (whole-stage codegen),
  not per-cell pandas lambdas;
- idempotency = marker anti-join before the read + marker upsert after
  the sink commit (the reference's exists()/touch() protocol).
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TableSpec
from .notify import Notifier
from .operators import transforms as TR
from .operators.marker import ParquetMarkerLedger
from .plans.worklist import build_worklist, config_frame, work_groups
from .sources.parquet_tree import (
    decode_input_file,
    discover_files,
    group_day_dirs,
    norm_path,
)


def stringify(df: DataFrame) -> DataFrame:
    """The reference's in-flight representation is all-strings
    (SURVEY.md §1.1.4): parquet → pandas-of-strings. Spark analog: cast
    every column to string; real NULLs become the literal 'None' exactly
    like pandas' str(NaN/NaT) rendering feeding `df.replace`."""
    return df.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("None")).alias(c)
            for c in df.columns
        ]
    )


@dataclass
class IngestResult:
    environment: str
    target_table: str
    n_files: int
    n_rows: int
    sink_path: str


@dataclass
class BatchIngest:
    spark: SparkSession
    catalog: dict[str, TableSpec]
    sink_root: str
    marker_path: str
    environments: list[str] | None = None
    layout: str = "hosting"
    jdbc_url: str | None = None  # when set, sink = JDBC append (S8)
    notifier: Notifier | None = None  # C4: summary on activity, failure on crash
    # P9: debug single-file filter (`main.py:38-39` keeps it as a
    # commented-out line; here it is a first-class run parameter).
    file_name: str | None = None
    results: list[IngestResult] = field(default_factory=list)

    def run(self, data_root: str, ingestion_date: dt.date) -> list[IngestResult]:
        """Run with the reference's notification contract (`main.py:181-193`):
        a summary message when anything was ingested, a failure message
        (exception attached) when the run crashes — then re-raise."""
        try:
            results = self._run(data_root, ingestion_date)
        except Exception as ex:
            if self.notifier is not None:
                self.notifier.send(f"ingestion failed: {ex!r}")
            raise
        if self.notifier is not None and results:
            self.notifier.send(self.summary())
        return results

    def _run(self, data_root: str, ingestion_date: dt.date) -> list[IngestResult]:
        files = discover_files(self.spark, data_root, self.layout)
        ledger = ParquetMarkerLedger(self.spark, self.marker_path)
        cfg = config_frame(self.spark, self.catalog)
        wl = build_worklist(
            files,
            cfg,
            ingestion_date,
            self.environments,
            ledger,
            file_name=self.file_name,
            source_col="environment" if self.layout == "hosting" else "data_source",
        )
        # Freeze the work-list before any marker mutation: the anti-join
        # reads the ledger, which ledger.touch() rewrites inside the loop.
        wl = wl.cache()
        wl.count()
        by_source = {t.target_name: t for t in self.catalog.values()}
        self.results = []
        for g in work_groups(wl):
            env, data_source, target = g.environment, g.data_source, g.target_table
            table = by_source[target]
            # Read-path push-down: the group descriptor bounds the scan to
            # its date-ranged day directories (O(days) driver metadata,
            # never a per-file path list), then the file-level survivors
            # (marker anti-join J4, debug filter P9) are enforced by a
            # DISTRIBUTED semi-join on input_file_name — the work-list
            # stays a DataFrame end-to-end, so a 10M-file tree never
            # materializes on the driver. AQE broadcasts the survivor
            # side while it is small and falls back to a shuffle join
            # when it isn't.
            day_dirs = group_day_dirs(
                self.spark,
                data_root,
                self.layout,
                data_source if self.layout != "hosting" else env,
                g.entity_name,
                g.min_date,
                g.max_date,
            )
            survivors = (
                wl.filter(
                    (F.col("environment") == env)
                    & (F.col("data_source") == data_source)
                    & (F.col("target_table") == target)
                )
                .select(norm_path(F.col("full_path")).alias("_wl_path"))
            )
            df = (
                self.spark.read.parquet(*day_dirs)
                .withColumn(
                    "_src_path",
                    norm_path(decode_input_file(F.input_file_name())),
                )
                .join(
                    survivors,
                    F.col("_src_path") == F.col("_wl_path"),
                    "left_semi",
                )
                .drop("_src_path")
            )
            cleaned = TR.clean_pipeline(
                stringify(df), table, data_source, ingestion_date
            )
            final = TR.materialize_nulls(cleaned)  # T12 at the sink boundary
            if self.jdbc_url is not None:
                from .sources.jdbc import write_table

                write_table(final, self.jdbc_url, target)
                out_path = f"{self.jdbc_url}::{target}"
                n_rows = final.count()
            else:
                out_path = os.path.join(self.sink_root, target, f"environment={env}")
                # Count THIS run's rows before appending — re-reading the
                # sink after the append would report the cumulative total
                # across every historical run.
                n_rows = final.count()
                final.write.mode("append").parquet(out_path)
            completed = (
                wl.filter(
                    (F.col("environment") == env) & (F.col("target_table") == target)
                )
                .select("file_name", "environment", "target_table", "backup_date")
            )
            ledger.touch(completed)
            self.results.append(
                IngestResult(env, target, g.n_files, n_rows, out_path)
            )
        wl.unpersist()
        return self.results

    def summary(self) -> str:
        """Run-summary (`main.py:133-142` analog, minus Slack)."""
        lines = [
            f"{r.environment}/{r.target_table}: {r.n_files} files -> {r.sink_path}"
            for r in self.results
        ]
        return "\n".join(lines) if lines else "nothing ingested"
