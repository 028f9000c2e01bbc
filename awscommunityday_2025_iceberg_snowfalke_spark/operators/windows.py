"""Window-function helpers (SURVEY §2.5, F7).

The reference leans on Snowflake's ``QUALIFY`` clause to filter on window
results (performance_comparison.sql:172; run_performance_tests.py:208). OSS
Spark SQL has no QUALIFY; the idiomatic translation is compute-then-filter,
which Catalyst plans as Window → Filter with the window shuffle keyed on the
partition columns (one exchange, no extra pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["qualify", "top_k_per_group", "with_prev"]


def qualify(df: DataFrame, predicate: Column) -> DataFrame:
    """Snowflake ``QUALIFY`` equivalent: filter on already-computed window
    columns. Caller computes the window column first (keeps the plan
    explicit and lets Catalyst place a single Window exchange)."""
    return df.filter(predicate)


def top_k_per_group(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column], k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k-per-group (W1+W3). At scale this is the right pattern: one
    hash-partition shuffle on the group keys, in-partition sort, early
    row_number cutoff — no global sort, no driver collect."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def with_prev(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column],
    col: str, alias: str,
) -> DataFrame:
    """LAG wrapper (W2) — previous value within a partition ordering."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(alias, F.lag(col).over(w))
