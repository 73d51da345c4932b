"""JDBC source/sink helpers (reference S8/S11/S12).

The reference bulk-inserts into SQL Server over ODBC
(`ParquetFileInsertion.py:60-65`); Spark-native equivalent is
``df.write.jdbc`` with a batched, partition-parallel writer. No SQL
Server (or its driver jar) exists in this container, but Spark bundles
embedded Derby — the integration tests run the full write/read/reflect
path against ``jdbc:derby:memory:`` so the sink is exercised end-to-end,
not just unit-tested for option shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sqlserver_url(host: str, database: str, port: int = 1433) -> str:
    """`main.py:64-68` builds an mssql+pyodbc DSN; the Spark analog."""
    return f"jdbc:sqlserver://{host}:{port};databaseName={database};encrypt=false"


def derby_memory_url(name: str) -> str:
    """In-process Derby (bundled with Spark) — the test stand-in for the
    SQL Server target; same code path, different dialect."""
    return f"jdbc:derby:memory:{name};create=true"


def write_options(batchsize: int = 10_000, isolation: str = "READ_COMMITTED") -> dict:
    """Sink tuning: batched inserts bound executor memory; at scale also
    cap write parallelism with df.coalesce(n) so the DB isn't hit by
    hundreds of concurrent connections."""
    return {
        "batchsize": str(batchsize),
        "isolationLevel": isolation,
        "rewriteBatchedStatements": "true",
    }


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    max_connections: int = 8,
    batchsize: int = 10_000,
    properties: dict | None = None,
) -> None:
    """Append rows to ``schema.table`` (raw.<target> in the reference).

    Idempotency is NOT provided by JDBC append — callers must dedup via
    the marker ledger (operators.marker) before writing, exactly like the
    reference's marker-exists check (`CustomMarkerTable.py:47-59`).
    """
    out = df.coalesce(max_connections)
    opts = write_options(batchsize)
    opts.update(properties or {})
    out.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**opts).save()


def write_table_transactional(
    df: DataFrame,
    url: str,
    table: str,
    staging_suffix: str = "_staging",
    batchsize: int = 10_000,
) -> None:
    """Exactly-once JDBC publish under task retries: stage, then commit.

    ``df.write.jdbc(mode="append")`` is not transactional across Spark
    task retries — a task that dies after inserting half its batch leaves
    rows behind, and its retry double-inserts them. The reference papers
    over this with whole-file retries + the marker check
    (`ParquetFileInsertion.py:21`, `CustomMarkerTable.py:47-59`); the
    robust pattern is:

    1. Spark appends to a staging table (task failures may leave it
       dirty — it is truncated first and rewritten wholesale);
    2. one driver-side JDBC transaction atomically publishes
       ``INSERT INTO target SELECT * FROM staging`` and drops staging —
       target either gets the full batch once, or nothing.

    The publish statement runs on a single connection via the JVM's
    DriverManager (no extra Python DB driver needed).
    """
    staging = f"{table}{staging_suffix}"
    spark = df.sparkSession
    write_table(df, url, staging, mode="overwrite", batchsize=batchsize)
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        cols = ", ".join(f'"{c}"' for c in df.columns)
        try:
            stmt.executeUpdate(
                f'INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging}'
            )
        except Exception:
            # Target may not exist yet: create-as-select via Spark writer
            # would lose the transaction; instead create empty and retry.
            conn.rollback()
            ddl = jvm.java.sql.DriverManager.getConnection(url)
            try:
                d = ddl.createStatement()
                d.executeUpdate(
                    f'CREATE TABLE {table} AS SELECT * FROM {staging} WITH NO DATA'
                )
            finally:
                ddl.close()
            stmt.executeUpdate(
                f'INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging}'
            )
        stmt.executeUpdate(f"DROP TABLE {staging}")
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def read_query(spark: SparkSession, url: str, query: str) -> DataFrame:
    """S11: SQL query source (`pandas.read_sql` analog)."""
    return spark.read.format("jdbc").option("url", url).option("query", query).load()


def reflect_columns(spark: SparkSession, url: str, table: str) -> list[str]:
    """S12: schema reflection — column names of a remote table."""
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT * FROM {table} WHERE 1=0")
        .load()
    )
    return df.columns
