"""Scalar/aggregate helper expressions (SURVEY §2.8).

Includes the determinism shims that make float aggregates reproducible
across engines and partitionings: double summation is order-dependent, so
any AVG/SUM of doubles that feeds a correctness comparison is computed in
exact DECIMAL first (associative → partition-order independent), then cast
back. At 100 TB this is also the *right* semantics for money-like columns
(the reference's NUMBER(38,0) columns, terraform/snowflake.tf:120-123).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["det_avg", "det_sum", "det_avg_sql", "det_sum_sql", "mask_unless"]

# 18 digits keeps Spark's Decimal on its long-backed fast path (beyond 18
# the per-row cast allocates JVM BigDecimals — measured ~1.4x slower on
# q1's 7-aggregate pass at sf0.1). Scale 8 + 10 integral digits covers
# every money/value column in the schema (|x| < 1e10); the SUM buffer
# auto-widens (Spark → decimal(28,8), duckdb → DECIMAL(38,8)) so no
# overflow at any corpus size. Both engines cast per-row at (18,8) →
# values stay bit-identical.
_DEC = "decimal(18,8)"
_DEC_SQL = "DECIMAL(18,8)"


def det_avg(col: str | Column, scale: int = 4) -> Column:
    """Deterministic AVG over a double column: exact decimal sum / count,
    rounded to ``scale``. Same value on any engine, any partition order."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(_DEC)).cast("double")
    return F.round(total / F.count(c), scale)


def det_sum(col: str | Column, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)).cast("double"), scale)


def det_avg_sql(expr: str, scale: int = 4) -> str:
    """duckdb twin of :func:`det_avg` (COUNT of non-null values)."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS {_DEC_SQL})) AS DOUBLE)"
        f" / COUNT({expr}), {scale})"
    )


def det_sum_sql(expr: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS {_DEC_SQL})) AS DOUBLE), {scale})"


def mask_unless(col: str | Column, authorized: bool, mask: str = "***MASKED***") -> Column:
    """Column-masking policy expression (G2 — P:778-781)."""
    c = F.col(col) if isinstance(col, str) else col
    return c if authorized else F.lit(mask)
