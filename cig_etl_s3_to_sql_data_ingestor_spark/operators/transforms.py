"""The cleaning-transform core: T1-T12 from SURVEY.md §2.7, re-expressed as
native Column expressions (whole-stage codegen; no Python UDFs anywhere).

Reference semantics source: `/root/reference/CigEolHostingIngestionLogic.py`
(exact call order at lines 32-41: T5 default-missing, T6 nullable-int, T7
sci-notation, T9 not-nullable scrub, T8 timestamp truncation, T10
nvarchar(max) cap, T11 odd columns) and
`/root/reference/ParquetFileInsertion.py:59-75` (T12 NULL materialization).

Deliberate reference quirks are reproduced and unit-tested (FIXTURES.md F7):
- T6 removes *all* ``.0`` substrings when the value ends with ``.0``
  ("1.014.0" -> "114");
- T4 replaces whole cells only ("nanarnia" untouched) while T9 replaces
  substrings ("NoneSuch" -> "Such");
- T1 implements the *intent* of the reference's latent bug
  (`environment.length` would raise; the working duplicate is
  `main_mailbox.py:56`).

Scale notes: every step is a projection — zero shuffles for the whole
pipeline; a 100 TB ingest is scan -> map -> sink. T7/T8 are the only
two-pass steps (a column-stat aggregate gates a rewrite); the gate is one
tiny extra job whose result is folded into the plan as a literal, exactly
like the reference's pandas pre-scan, and both passes still read the
pruned column set only.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import TableSpec

NVARCHAR_MAX_LIMIT = 100_000  # ODBC 7125 workaround (reference :56)
TIMESTAMP_MAX_LEN = 23  # yyyy-MM-dd HH:mm:ss.SSS (reference :102)

# ---------------------------------------------------------------------------
# Scalar building blocks (each maps 1:1 to a reference behavior)
# ---------------------------------------------------------------------------


def derive_environment_value(environment: str) -> str:
    """T1 driver-side variant (the env is a per-file constant)."""
    return environment.split("_")[0] if len(environment) > 2 else environment


def derive_environment(col: Column) -> Column:
    """T1 as a column expression: `NL_Hosting_Mailbox` -> `NL`."""
    return F.when(F.length(col) > 2, F.split(col, "_").getItem(0)).otherwise(col)


def sentinel_replace(col: Column) -> Column:
    """T4: whole-cell replace of NaT/nan -> None and True/False -> 1/0."""
    return (
        F.when(col == "NaT", "None")
        .when(col == "nan", "None")
        .when(col == "True", "1")
        .when(col == "False", "0")
        .otherwise(col)
    )


def strip_decimal_suffix(col: Column) -> Column:
    """T6: if the value ends with ``.0`` remove ALL ``.0`` substrings
    (quirk-exact: "1.014.0" -> "114")."""
    return F.when(col.endswith(".0"), F.regexp_replace(col, r"\.0", "")).otherwise(col)


def normalize_int_string(col: Column) -> Column:
    """Idiomatic (non-quirk) integer normalization used by oracle-facing
    queries: parse to double, render as integer text, preserve sentinels.

    Chosen over the reference's float-repr pass (T7) because Java and C
    double formatting differ; the *value* semantics are identical for
    integral columns.
    """
    return F.when(
        (col.isNull()) | (col == "None"), col
    ).otherwise(col.try_cast("double").cast("long").cast("string"))


def not_nullable_scrub(col: Column) -> Column:
    """T9: default to '' and remove the SUBSTRING 'None' ("NoneSuch"->"Such")."""
    return F.regexp_replace(F.coalesce(col, F.lit("")), "None", "")


def truncate_nvarchar(col: Column, limit: int = NVARCHAR_MAX_LIMIT) -> Column:
    """T10: nvarchar(max) cap."""
    return F.substring(col, 1, limit)


def materialize_null(col: Column) -> Column:
    """T12: the literal string 'None' becomes a real NULL at the sink."""
    return F.when(col == "None", F.lit(None).cast("string")).otherwise(col)


# ---------------------------------------------------------------------------
# Frame-level steps
# ---------------------------------------------------------------------------


def add_audit_columns(df: DataFrame, environment: str, ingestion_date: date) -> DataFrame:
    """T1+T2+T3: Environment / CIGCopyTime / CIGProcessed constants."""
    return (
        df.withColumn("Environment", F.lit(derive_environment_value(environment)))
        .withColumn("CIGCopyTime", F.lit(ingestion_date.strftime("%Y-%m-%d")))
        .withColumn("CIGProcessed", F.lit("0"))
    )


def replace_sentinels(df: DataFrame) -> DataFrame:
    """T4 over every string column (the reference's frame-wide replace).

    One ``withColumns`` projection, NOT a per-column ``withColumn`` loop:
    chained withColumn stacks one Project node per column, and analyzing
    427 stacked projections of 427 fields is quadratic in width — the
    difference between milliseconds and minutes of planning on the
    DivisionStatistics-shaped tables."""
    updates = {
        f_.name: sentinel_replace(F.col(f_.name))
        for f_ in df.schema.fields
        if f_.dataType.simpleString() == "string"
    }
    return df.withColumns(updates) if updates else df


def default_missing_columns(df: DataFrame, table: TableSpec) -> DataFrame:
    """T5: reflected target columns absent from the frame appear as 'None'."""
    missing = [c for c in table.column_names if c not in df.columns]
    return df.withColumns({c: F.lit("None") for c in missing}) if missing else df


def normalize_nullable_ints(df: DataFrame, table: TableSpec) -> DataFrame:
    """T6 for every nullable int column."""
    cols = [c.name for c in table.columns_of_type("int", nullable=True) if c.name in df.columns]
    return df.withColumns({c: strip_decimal_suffix(F.col(c)) for c in cols}) if cols else df


def normalize_sci_notation(df: DataFrame, table: TableSpec) -> DataFrame:
    """T7: gated per column on 'any value contains e-/e+' (A4), then the
    whole column is passed through float parsing.

    The gate is computed in ONE aggregate job over all candidate columns
    (the reference does a pandas pre-scan per column); the rewrite itself
    is `normalize_int_string` — see its docstring for the documented
    deviation from Python float repr.
    """
    cols = [c.name for c in table.columns_of_type("int", nullable=True) if c.name in df.columns]
    if not cols:
        return df
    gates = df.agg(
        *[
            F.max(
                F.col(c).contains("e-") | F.col(c).contains("e+")
            ).alias(c)
            for c in cols
        ]
    ).first()
    hit = [c for c in cols if gates[c]]
    return df.withColumns({c: normalize_int_string(F.col(c)) for c in hit}) if hit else df


def scrub_not_nullable(df: DataFrame, table: TableSpec) -> DataFrame:
    """T9 for every non-nullable target column (creates missing ones as '').

    Single ``withColumns`` projection — see replace_sentinels for why a
    withColumn loop is quadratic in table width."""
    cols = [c.name for c in table.columns if not c.nullable]
    updates = {
        c: not_nullable_scrub(F.col(c) if c in df.columns else F.lit(""))
        for c in cols
    }
    return df.withColumns(updates) if updates else df


def truncate_long_timestamps(
    df: DataFrame, cols: list[str], out_suffix: str = ""
) -> DataFrame:
    """T8: per column, truncate to 23 chars iff the column-wide max string
    length exceeds 23. One aggregate job computes every gate at once; its
    result folds into the projection as constants (no unpartitioned window
    at scale)."""
    present = [c for c in cols if c in df.columns]
    if not present:
        return df
    gates = df.agg(
        *[F.max(F.length(F.col(c))).alias(c) for c in present]
    ).first()
    updates = {}
    for c in present:
        maxlen = gates[c] or 0
        val = F.substring(F.col(c), 1, TIMESTAMP_MAX_LEN) if maxlen > TIMESTAMP_MAX_LEN else F.col(c)
        updates[c + out_suffix] = val
    return df.withColumns(updates)


def truncate_timestamps_for_table(df: DataFrame, table: TableSpec) -> DataFrame:
    return truncate_long_timestamps(df, [c.name for c in table.columns_of_type("datetime")])


def truncate_nvarchar_max(df: DataFrame, table: TableSpec) -> DataFrame:
    """T10 for str columns with no declared length."""
    cols = [
        c.name
        for c in table.columns
        if c.ctype == "str" and c.length is None and c.name in df.columns
    ]
    return df.withColumns({c: truncate_nvarchar(F.col(c)) for c in cols}) if cols else df


ODD_COLUMNS = {"Geolocation": "POINT (0 0)", "Logo": "None", "Picture": "None"}


def neutralize_odd_columns(df: DataFrame) -> DataFrame:
    """T11: geography/binary columns pinned to constants (reference :120-128)."""
    updates = {c: F.lit(v) for c, v in ODD_COLUMNS.items() if c in df.columns}
    return df.withColumns(updates) if updates else df


def ordered_projection(df: DataFrame, table: TableSpec) -> DataFrame:
    """P1: exactly the configured columns, in configured order."""
    return df.select(*table.column_names)


def materialize_nulls(df: DataFrame) -> DataFrame:
    """T12 over every string column, applied just before the sink."""
    updates = {
        f_.name: materialize_null(F.col(f_.name))
        for f_ in df.schema.fields
        if f_.dataType.simpleString() == "string"
    }
    return df.withColumns(updates) if updates else df


def clean_pipeline(
    df: DataFrame, table: TableSpec, environment: str, ingestion_date: date
) -> DataFrame:
    """The full reference pipeline in the reference's call order
    (`CigEolHostingIngestionLogic.py:32-41`), ending with the ordered
    projection (P1). T12 is applied separately by the sink."""
    df = add_audit_columns(df, environment, ingestion_date)  # T1-T3
    df = replace_sentinels(df)  # T4
    df = default_missing_columns(df, table)  # T5
    df = normalize_nullable_ints(df, table)  # T6
    df = normalize_sci_notation(df, table)  # T7
    df = scrub_not_nullable(df, table)  # T9
    df = truncate_timestamps_for_table(df, table)  # T8
    df = truncate_nvarchar_max(df, table)  # T10
    df = neutralize_odd_columns(df)  # T11
    return ordered_projection(df, table)  # P1
