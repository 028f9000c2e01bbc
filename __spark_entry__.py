"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``awscommunityday_2025_iceberg_snowfalke_spark``
(operators/* modules each export QUERIES + ORACLE dicts; this file just
merges them).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from awscommunityday_2025_iceberg_snowfalke_spark.operators import (  # noqa: E402
    all_oracle,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: region_join_agg — broadcast
    dim join → filter → multi-aggregate → sort (PC:90-101 parity)."""
    from awscommunityday_2025_iceberg_snowfalke_spark.operators.relational import (
        region_join_agg,
    )

    return region_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins for every SQL-expressible query;
    non-SQL-expressible ops (streaming/state, engine-specific hashes) are
    intentionally absent → driver records the weaker rows-only check."""
    return all_oracle()
