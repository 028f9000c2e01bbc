"""SparkSession factory.

The reference runs all compute on a Snowflake X-SMALL warehouse
(demo-setup/terraform/snowflake.tf:4-11); our equivalent is a tuned
SparkSession. Defaults target local[N] testing but every knob is chosen so
the same plans scale to a 1000-executor cluster reading ~100 TB:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy switch — the 100 TB insurance policy.
- Arrow on: vectorized pandas interchange for the Pandas-UDF extension
  operators (similarity / text analysis).
- Session TZ pinned UTC: parity with the duckdb oracle's naive timestamps
  and with the reference's TIMESTAMP_NTZ columns
  (demo-setup/terraform/snowflake.tf:140-143).
- shuffle.partitions defaults to the local core count; on a real cluster
  AQE coalescing makes the static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "tune_for_scale"]


def get_spark(
    app_name: str = "awscommunityday_2025_iceberg_snowfalke_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else n

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # driver testdata writes TIMESTAMP(NANOS); see sources.registry.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python DataSource filter pushdown (sources.pyds file pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    # flag-gated real-Iceberg catalog (no-op unless SPARK_GRAFT_ICEBERG_JAR
    # points at a local iceberg-spark-runtime jar — see sources/iceberg.py)
    from .sources.iceberg import configure_builder

    builder = configure_builder(builder)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_scale(spark: SparkSession, target_tb: float = 100.0) -> dict[str, str]:
    """Return (and apply) the conf deltas we would ship for a real cluster at
    ``target_tb`` of input. Documented so the local plans and the cluster
    plans stay structurally identical; on local[N] these are mostly no-ops
    because AQE re-coalesces at runtime.
    """
    # ~128 MB per shuffle partition post-compression is the classic target.
    bytes_total = int(target_tb * (1 << 40))
    parts = max(256, min(200_000, bytes_total // (128 * (1 << 20))))
    conf = {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * (1 << 20)),
        "spark.sql.files.maxPartitionBytes": str(256 * (1 << 20)),
    }
    for k, v in conf.items():
        spark.conf.set(k, v)
    return conf
