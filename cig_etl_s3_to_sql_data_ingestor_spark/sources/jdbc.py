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

import uuid

from pyspark.sql import DataFrame, SparkSession

# Derby SQLStates for "the referenced table/schema is absent" — the only
# failure class write_table_transactional treats as recoverable (by
# creating the target); anything else propagates untouched.
_TABLE_MISSING_STATES = {"42X05", "42Y07"}
_DUPLICATE_KEY_STATE = "23505"


def _sqlstate(exc) -> str | None:
    """Extract the SQLState from a Py4J-wrapped SQLException (walking the
    Java cause chain — Spark sometimes wraps the driver's exception)."""
    je = getattr(exc, "java_exception", None)
    while je is not None:
        try:
            state = je.getSQLState()
            if state:
                return state
        except Exception:
            pass
        je = je.getCause() if hasattr(je, "getCause") else None
    return None


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


def bounded_write_frame(df: DataFrame, max_connections: int) -> DataFrame:
    """The frame actually handed to the JDBC writer: coalesced so at
    most ``max_connections`` tasks (= concurrent DB connections) write.
    The reference caps this with luigi ``workers`` (10,
    `/root/reference/luigi.cfg:1-2`); Spark's unit of write concurrency
    is the partition, so the cap is a coalesce — which only ever
    NARROWS (an input with fewer partitions keeps them; no shuffle is
    introduced to widen). Factored out so tests can pin the arithmetic
    without intercepting the write."""
    return df.coalesce(max_connections)


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
    out = bounded_write_frame(df, max_connections)
    opts = write_options(batchsize)
    opts.update(properties or {})
    # numPartitions is the JDBC writer's own concurrency cap — belt and
    # braces with the coalesce above (the writer coalesces further if a
    # future caller hands it a wider frame).
    out.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).option("numPartitions", str(max_connections)).options(**opts).save()


def write_table_transactional(
    df: DataFrame,
    url: str,
    table: str,
    staging_suffix: str | None = None,
    batchsize: int = 10_000,
    epoch_id: int | None = None,
    epoch_table: str = "etl_epochs",
) -> bool:
    """Exactly-once JDBC publish under task retries AND driver replays.

    ``df.write.jdbc(mode="append")`` is not transactional across Spark
    task retries — a task that dies after inserting half its batch leaves
    rows behind, and its retry double-inserts them. The reference papers
    over this with whole-file retries + the marker check
    (`ParquetFileInsertion.py:21`, `CustomMarkerTable.py:47-59`); the
    robust pattern is:

    1. Spark writes the batch to a per-call staging table (the name
       carries a random suffix so concurrent publishes to the same target
       never collide; task failures may leave it dirty — it is rewritten
       wholesale);
    2. one driver-side JDBC transaction atomically publishes
       ``INSERT INTO target SELECT * FROM staging`` and drops staging —
       target either gets the full batch once, or nothing.

    With ``epoch_id`` set (the foreachBatch batch id), the same
    transaction also inserts ``(table, epoch_id)`` into ``epoch_table``
    (primary-keyed) — a driver that died between a committed publish and
    the streaming checkpoint replays the batch, hits the duplicate key,
    and the whole publish rolls back: returns False, target unchanged.
    This closes the at-least-once window between sink commit and
    checkpoint commit. Returns True when the batch was published.

    Only the "target table absent" SQLState is treated as recoverable
    (create empty, retry); every other INSERT failure — type mismatch,
    constraint violation — propagates as-is.
    """
    staging = (
        f"{table}{staging_suffix}"
        if staging_suffix is not None
        else f"{table}_stg_{uuid.uuid4().hex[:8]}"
    )
    spark = df.sparkSession
    jvm = spark._jvm

    def _autocommit_exec(sql: str, ignore_states: set[str] = frozenset()) -> None:
        c = jvm.java.sql.DriverManager.getConnection(url)
        try:
            c.createStatement().executeUpdate(sql)
        except Exception as ex:
            if _sqlstate(ex) not in ignore_states:
                raise
        finally:
            c.close()

    if epoch_id is not None:
        # X0Y32 = object already exists — the one state to ignore here.
        _autocommit_exec(
            f"CREATE TABLE {epoch_table} ("
            "target_name VARCHAR(128) NOT NULL, epoch_id BIGINT NOT NULL, "
            "published_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP, "
            "PRIMARY KEY (target_name, epoch_id))",
            ignore_states={"X0Y32"},
        )

    write_table(df, url, staging, mode="overwrite", batchsize=batchsize)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        cols = ", ".join(f'"{c}"' for c in df.columns)
        insert_sql = f'INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging}'
        try:
            stmt.executeUpdate(insert_sql)
        except Exception as ex:
            if _sqlstate(ex) not in _TABLE_MISSING_STATES:
                raise
            # Target may not exist yet: create-as-select via Spark writer
            # would lose the transaction; instead create empty and retry.
            conn.rollback()
            _autocommit_exec(
                f'CREATE TABLE {table} AS SELECT * FROM {staging} WITH NO DATA'
            )
            stmt.executeUpdate(insert_sql)
        if epoch_id is not None:
            try:
                stmt.executeUpdate(
                    f"INSERT INTO {epoch_table} (target_name, epoch_id) "
                    f"VALUES ('{table}', {int(epoch_id)})"
                )
            except Exception as ex:
                if _sqlstate(ex) != _DUPLICATE_KEY_STATE:
                    raise
                # Replayed epoch: roll the whole publish back — the rows
                # already landed in a previous, committed transaction.
                conn.rollback()
                _autocommit_exec(f"DROP TABLE {staging}", ignore_states={"42Y55"})
                return False
        stmt.executeUpdate(f"DROP TABLE {staging}")
        conn.commit()
        return True
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()


def read_query(spark: SparkSession, url: str, query: str) -> DataFrame:
    """S11: SQL query source (`pandas.read_sql` analog) — ONE connection,
    one task. Fine for the reference's small verification reads
    (`test_compare_sql_local_and_prod_data.py:57-67`); any table-sized
    read should go through :func:`read_table`, which parallelizes."""
    return spark.read.format("jdbc").option("url", url).option("query", query).load()


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """S11 at scale: partitioned/parallel JDBC read of ``table`` (which
    may be any ``(subquery) alias``).

    Three modes, most-parallel first:

    - ``predicates`` — one task per predicate string, each reading
      ``WHERE <predicate>``; the caller owns disjointness/coverage
      (e.g. per-day ranges mirroring the ingest partitioning). This is
      the only mode that parallelizes on non-numeric keys without
      bounds.
    - ``partition_column`` + bounds — Spark's stride-partitioned read:
      ``num_partitions`` tasks each scan a [lower, upper) stride of the
      (numeric/date/timestamp) column. Rows OUTSIDE the bounds are
      still read (first/last stride are unbounded), so bounds tune
      parallelism, never correctness. If bounds are omitted they are
      discovered with one bounded MIN/MAX probe query — one extra
      round-trip for a table-sized scan.
    - neither — single-connection fallback, same as :func:`read_query`.

    ``num_partitions`` (default 8) applies ONLY to the stride mode; in
    predicates mode the task count IS ``len(predicates)``, so passing
    both raises rather than silently ignoring one.

    Trust boundary: ``table``, ``partition_column``, and ``predicates``
    are interpolated into SQL verbatim (the MIN/MAX probe, Spark's own
    dbtable subselect) — they must be trusted identifiers/fragments
    from the ingest config, never end-user input.

    The reference's S11 surface (`test_compare_sql_local_and_prod_data.py`
    :57-67) re-reads ingested `raw.*` tables for verification; at this
    engine's 100 TB brief such reads must not funnel through one
    connection — the Derby test pins >1 input partition AND
    row-identical results vs the single-partition path.
    """
    reader = spark.read.format("jdbc").option("url", url)
    if predicates is not None:
        if partition_column is not None:
            raise ValueError(
                "pass either predicates or partition_column, not both"
            )
        if num_partitions is not None:
            raise ValueError(
                "num_partitions is meaningless with predicates (the "
                "task count is len(predicates)) — drop one"
            )
        return spark.read.jdbc(url, table, predicates=predicates)
    if num_partitions is None:
        num_partitions = 8
    if partition_column is None:
        return reader.option("dbtable", table).load()
    if lower_bound is None or upper_bound is None:
        # Aliases are required (Spark wraps the query in a subselect and
        # unnamed aggregate columns break it); access is positional
        # because dialects disagree on alias case (Derby uppercases).
        probe = read_query(
            spark,
            url,
            f"SELECT MIN({partition_column}) AS pb_lo, "
            f"MAX({partition_column}) AS pb_hi FROM {table}",
        ).first()
        lower_bound = probe[0] if lower_bound is None else lower_bound
        upper_bound = probe[1] if upper_bound is None else upper_bound
        if lower_bound is None or upper_bound is None:
            # Empty table / all-NULL partition column: a NULL probe
            # would otherwise reach Spark as the string "None" (even
            # with ONE caller-given bound). Nothing to parallelize —
            # fall back to the single-connection read.
            return reader.option("dbtable", table).load()
    return (
        reader.option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def reflect_columns(spark: SparkSession, url: str, table: str) -> list[str]:
    """S12: schema reflection — column names of a remote table."""
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT * FROM {table} WHERE 1=0")
        .load()
    )
    return df.columns
