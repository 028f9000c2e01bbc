"""Distributed synthetic-data generator — the reference's write path
(§3.3 entry point 3) as a Spark job.

The reference generates events row-wise in pandas (generate_sample_data.py:
29-54: random user_id 1..100000, one of 10 event types, intra-day random
timestamp, a properties dict JSON-encoded at write time :142-143, one of 4
regions :23) and uploads Parquet per small/large file regime (:83-138).

Here generation is a ``spark.range(n)`` with deterministic column
expressions — every "random" draw is an md5-hash of (salt, row id), so the
dataset is reproducible on any cluster at any parallelism (the reference's
``random.randint`` is not), and the whole pipeline stays in whole-stage
codegen: generating 100 TB is an embarrassingly parallel scan of a range,
no driver-side loops, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# generate_sample_data.py:24-27
EVENT_TYPES = [
    "page_view",
    "click",
    "purchase",
    "signup",
    "login",
    "logout",
    "search",
    "add_to_cart",
    "checkout",
    "download",
]
# generate_sample_data.py:23
REGIONS = ["us-east-1", "us-west-2", "eu-west-1", "ap-southeast-1"]

_MAX15 = float(16**15)


def _uniform(id_col: Column, salt: str) -> Column:
    """Deterministic pseudo-uniform in [0, 1): md5(salt‖id) 60-bit prefix."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("double")
    return h / F.lit(_MAX15)


def _pick(id_col: Column, salt: str, values: list[str]) -> Column:
    idx = (_uniform(id_col, salt) * len(values)).cast("int") + 1
    return F.element_at(F.array(*[F.lit(v) for v in values]), idx)


def generate_user_events(
    spark: SparkSession,
    n_events: int,
    base_date: str = "2025-01-01",
    n_days: int = 7,
    n_users: int = 100_000,
    partitions: int | None = None,
) -> DataFrame:
    """user_events with the reference schema (terraform/main.tf:97-135):
    (user_id long, event_type string, timestamp, properties JSON-string,
    region string) — properties carries session_id/user_agent/platform
    always (GEN:58-62) plus the event-type-specific keys (GEN:64-79)."""
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    event_type = _pick(i, "et", EVENT_TYPES)
    day = (_uniform(i, "day") * n_days).cast("int")
    sec = (_uniform(i, "sec") * 86400).cast("int")
    ts = F.to_timestamp(F.lit(f"{base_date} 00:00:00")) + F.make_dt_interval(
        day.cast("int"), F.lit(0), F.lit(0), sec.cast("double")
    )
    base_props = F.create_map(
        F.lit("session_id"), F.substring(F.md5(F.concat(F.lit("sess"), i.cast("string"))), 1, 8),
        F.lit("user_agent"), _pick(i, "ua", ["Mozilla/5.0", "Chrome/120.0", "Safari/17.0"]),
        F.lit("platform"), _pick(i, "pf", ["web", "mobile", "tablet"]),
    )
    purchase_props = F.create_map(
        F.lit("product_id"), F.concat(F.lit("prod_"), (_uniform(i, "pid") * 1000).cast("int").cast("string")),
        F.lit("amount"), F.format_number(_uniform(i, "amt") * 490 + 10, 2),
        F.lit("currency"), F.lit("USD"),
    )
    page_props = F.create_map(
        F.lit("page_url"), F.concat(F.lit("/page/"), (_uniform(i, "pg") * 100).cast("int").cast("string")),
        F.lit("referrer"), _pick(i, "ref", ["google", "direct", "social"]),
    )
    search_props = F.create_map(
        F.lit("query"), F.concat(F.lit("query_"), (_uniform(i, "q") * 500).cast("int").cast("string")),
        F.lit("results_count"), (_uniform(i, "rc") * 100).cast("int").cast("string"),
    )
    props = F.when(
        event_type == "purchase", F.map_concat(base_props, purchase_props)
    ).when(
        event_type == "page_view", F.map_concat(base_props, page_props)
    ).when(
        event_type == "search", F.map_concat(base_props, search_props)
    ).otherwise(base_props)
    return rng.select(
        ((_uniform(i, "uid") * n_users).cast("long") + 1).alias("user_id"),
        event_type.alias("event_type"),
        ts.alias("timestamp"),
        F.to_json(props).alias("properties"),
        _pick(i, "rg", REGIONS).alias("region"),
    )


def generate_user_profiles(
    spark: SparkSession, n_users: int = 10_000, partitions: int | None = None
) -> DataFrame:
    """user_profiles (snowflake.tf:115-146; GEN:163-176): 10 K rows,
    created_at within the trailing 365 days of the fixed anchor."""
    rng = spark.range(1, n_users + 1, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    created = F.to_timestamp(F.lit("2025-01-01 00:00:00")) - F.make_dt_interval(
        (_uniform(i, "cd") * 365).cast("int"), F.lit(0), F.lit(0), F.lit(0.0)
    )
    return rng.select(
        i.alias("user_id"),
        F.concat(F.lit("User "), i.cast("string")).alias("name"),
        F.concat(F.lit("user"), i.cast("string"), F.lit("@example.com")).alias("email"),
        _pick(i, "rg", REGIONS).alias("region"),
        created.alias("created_at"),
    )
