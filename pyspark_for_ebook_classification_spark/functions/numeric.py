"""Numeric helpers for cross-engine deterministic aggregation.

Why: the driver's correctness gate hash-compares values between Spark and
a DuckDB oracle (SURVEY.md §3). A plain SUM over doubles is
order-DEPENDENT (floating-point addition is not associative; Spark's
partial aggregation order varies with partitioning), so the same query can
produce values differing in the last ulp between engines — or even between
runs. Fix: accumulate in DECIMAL (exact, order-independent), cast the
final value back to DOUBLE (correctly-rounded, so both engines produce the
identical bit pattern). The inner double expression (e.g.
``l_extendedprice * (1 - l_discount)``) is still IEEE-identical in both
engines because the operands come from the same parquet bytes.

At 100 TB scale this costs nothing: decimal partial aggregation is still a
single map-side-combined hash aggregate; only the accumulator type widens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: accumulation scale — test doubles have far fewer than 6 meaningful
#: decimal digits beyond the point, and random doubles essentially never
#: land exactly on a 1e-6 rounding boundary, so Spark/DuckDB cast-rounding
#: agrees.
SCALE = 6
DECIMAL_T = f"decimal(28,{SCALE})"


def dsum(expr: Column | str, alias: str) -> Column:
    """Order-independent SUM over a double expression.

    SQL twin: ``CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE) AS alias``
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(DECIMAL_T)).cast("double").alias(alias)


def davg(expr: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, both in
    double — a single deterministic IEEE division in both engines.

    SQL twin:
    ``CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE) / COUNT(expr) AS alias``
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    return (F.sum(col.cast(DECIMAL_T)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """The oracle-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{SCALE}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """The oracle-side rendering of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{SCALE}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
