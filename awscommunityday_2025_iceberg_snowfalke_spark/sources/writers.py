"""Sinks + layouts (SURVEY §2.1 S1-S3, S7).

The reference writes Hive-partitioned Parquet (year=/month=/day=/ paths,
generate_sample_data.py:106,135) with two deliberate file-size regimes
(small-file pathology vs healthy large files), CSV for the profile dim
(generate_sample_data.py:178-183), and a hot-tier CTAS
(demo-setup/README.md:199-200). Spark expresses all three declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 192 * 1024 * 1024  # reference optimum 128-256 MB (P:305)


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Hive-style time-partitioned Parquet sink (S1+S2).

    Mirrors generate_sample_data.py:106/135 layouts. At 100 TB the partition
    column bounds file counts: day granularity over a year = 365 partitions;
    Spark writes one file per partition per task, so pair with
    ``.repartition(partition cols)`` to avoid the small-file pathology the
    reference demos (P:130-147).
    """
    ts = F.col(ts_col)
    parted = df.withColumn("year", F.year(ts)).withColumn("month", F.month(ts))
    cols = ["year", "month"]
    if granularity == "day":
        parted = parted.withColumn("day", F.dayofmonth(ts))
        cols.append("day")
    # one shuffle keyed on the partition values → one file per partition
    parted.repartition(*[F.col(c) for c in cols]).write.mode(mode).partitionBy(
        *cols
    ).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (S3) — profile-table export parity
    (generate_sample_data.py:178-183)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV load with schema inference — ``COPY INTO ... SKIP_HEADER=1``
    parity (demo-setup/README.md:107-116)."""
    return spark.read.option("header", "true").option("inferSchema", "true").csv(path)


def ctas_hot_tier(
    events: DataFrame, path: str, cutoff: str, ts_col: str = "ts"
) -> DataFrame:
    """Hot-tier CTAS (S7): materialize recent rows to a fast table
    (demo-setup/README.md:199-200; P:936-939). Returns the re-read hot df.
    """
    hot = events.filter(F.col(ts_col) >= F.lit(cutoff))
    hot.write.mode("overwrite").parquet(path)
    return events.sparkSession.read.parquet(path)
