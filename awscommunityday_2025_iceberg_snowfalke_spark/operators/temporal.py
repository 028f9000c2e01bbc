"""Temporal join operators (north-star extension — Spark has no native
AS-OF join; the reference corpus has none either).

- ``asof_purchase_signup`` — for every purchase, the most recent signup of
  the same user at-or-before the purchase. Implemented with the scalable
  union+window technique: tag both streams, union them (no join!), sort
  within user by (ts, kind), and carry the last-seen signup forward with
  ``last(..., ignorenulls=True)``. ONE hash exchange on user_id for any
  number of rows on either side — the naive approach (join all pairs, keep
  max) is O(pairs) and explodes on active users; DuckDB's native ASOF JOIN
  verifies the semantics.
- ``purchases_within_hour_of_signup`` — interval range join (equi user key
  + time-band residual). Spark plans equi-key SMJ with the band as a
  residual filter — at scale the equi key bounds the pair space, the band
  prunes inside each key group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load


def _dedup_signups(ev: DataFrame) -> DataFrame:
    """One signup row per (user_id, ts) — max event_id wins — so the as-of
    pick is unique and engine-independent under ts ties."""
    return (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )


def asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )

    p_tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.col("event_id").alias("purchase_event_id"),
        F.lit(None).cast("long").alias("signup_event_id"),
        F.lit(None).cast("timestamp").alias("signup_ts"),
    )
    s_tagged = signups.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("purchase_event_id"),
        F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("signup_ts"),
    )
    # kind=0 sorts before kind=1 at equal ts → a same-instant signup is
    # visible to the purchase (ASOF's >= semantics). signup_event_id in the
    # ordering makes the max-event-id signup win ts ties WITHOUT a
    # pre-dedup groupBy — keeping the whole operator at ONE exchange (a
    # groupBy(user_id, ts) would not satisfy the window's user_id
    # partitioning and would shuffle a second time).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", F.col("signup_event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = p_tagged.unionByName(s_tagged).select(
        "user_id",
        "ts",
        "kind",
        "purchase_event_id",
        F.last("signup_event_id", ignorenulls=True).over(w).alias("signup_event_id"),
        F.last("signup_ts", ignorenulls=True).over(w).alias("signup_ts"),
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "purchase_event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "signup_event_id",
            F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        )
    )


def purchases_within_hour_of_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    signups = _dedup_signups(ev).select(
        "user_id", F.col("ts").alias("s_ts"), "signup_event_id"
    )
    return (
        purchases.join(
            signups,
            (purchases.user_id == signups.user_id)
            & (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") < F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "purchase_event_id",
            purchases.user_id.alias("user_id"),
            "signup_event_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        )
    )


QUERIES = {
    "asof_purchase_signup": asof_purchase_signup,
    "purchases_within_hour_of_signup": purchases_within_hour_of_signup,
}

ORACLE = {
    # duckdb's native ASOF JOIN is the semantic oracle for the union+window
    # implementation
    "asof_purchase_signup": """
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        signups AS (
            SELECT user_id, ts, MAX(event_id) AS signup_event_id
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id, ts
        )
        SELECT p.event_id AS purchase_event_id,
               p.user_id,
               STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               s.signup_event_id,
               STRFTIME(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        FROM purchases p
        ASOF LEFT JOIN signups s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    "purchases_within_hour_of_signup": """
        SELECT p.event_id AS purchase_event_id,
               p.user_id,
               s.signup_event_id,
               STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               STRFTIME(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, ts, MAX(event_id) AS signup_event_id
              FROM events WHERE event_type = 'signup'
              GROUP BY user_id, ts) s
          ON p.user_id = s.user_id
         AND p.ts >= s.ts
         AND p.ts < s.ts + INTERVAL 1 HOUR
    """,
}
