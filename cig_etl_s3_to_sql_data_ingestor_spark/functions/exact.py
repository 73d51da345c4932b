"""Oracle-exact aggregation helpers.

Summing doubles is order-dependent, and a distributed engine sums in a
different order than a single-threaded oracle — so any correctness gate
built on value-hashing would flake. The fix used across this engine: the
per-row expression is evaluated in (deterministic, per-element) double
arithmetic, cast to a fixed-scale DECIMAL, summed exactly (decimal addition
is associative), and the final total cast back to DOUBLE. Both Spark and
DuckDB produce bit-identical results under this scheme at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def exact_sum(expr: Column, scale: int = 4) -> Column:
    """sum(expr) with order-independent (decimal) accumulation → double."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(expr: Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum, then one double division."""
    return (
        F.sum(expr.cast(f"decimal(18,{scale})")).cast("double") / F.count(expr)
    )


def sql_exact_sum(expr: str, scale: int = 4) -> str:
    """DuckDB-side mirror of :func:`exact_sum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_exact_avg(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
