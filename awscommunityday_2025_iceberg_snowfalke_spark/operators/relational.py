"""The reference's relational query corpus, Spark-first (SURVEY §2.2-§2.9).

Every query here reproduces a named query from the reference's performance
suites — `demo-setup/performance-tests/performance_comparison.sql` (PC) and
`run_performance_tests.py` (RPT) — re-targeted at the driver's deterministic
testdata (events = user_events, customer⋈nation⋈region = user_profiles).
CURRENT_DATE-relative predicates are pinned to literal dates inside the
data's 2024-01 window (SURVEY §5 determinism rules).

Scale notes (100 TB stance):
- The profile dimension is always the broadcast side (J1): fact-side scan
  never shuffles for the join.
- Aggregations are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the exchange; COUNT(DISTINCT) over two keys
  expands once — acceptable; `approx_count_distinct` variants live in the
  bench harness for the true 100 TB path.
- All filters are plain column predicates on the scan table → pushed to
  Parquet (verified via plans.check_pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import det_avg, det_avg_sql
from ..sources.registry import CUTOFF_7D, CUTOFF_30D, PROFILES_SQL, load, user_profiles
from .windows import qualify

_TS7 = "TIMESTAMP '2024-01-24 00:00:00'"
_TS30 = "TIMESTAMP '2024-01-01 00:00:00'"


def _ts(lit: str):
    return F.to_timestamp(F.lit(lit))


# --- A1: COUNT(*) global (PC:54) -------------------------------------------
def count_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("cnt"))


# --- F3+A3: filtered multi-distinct counts (PC:66-74) -----------------------
def filtered_counts_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("ts") >= _ts(CUTOFF_7D))
    return ev.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.countDistinct("event_type").alias("event_types"),
    )


# --- J1+A2/A3/A7: activity summary view (PC:24-34) --------------------------
def activity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiles LEFT JOIN events → per-user COUNT / COUNT DISTINCT / MAX.

    Scale rewrite: Spark cannot broadcast the *preserved* side of a left
    outer join (the hint is ignored and the whole fact table shuffles into
    a sort-merge join). Instead we aggregate events by user_id first —
    partial (map-side) aggregation shrinks the shuffle to one row per
    (user, event_type) — then left-join profiles against the per-user
    aggregate, which is broadcastable as the build side. Same semantics as
    PC:24-34 (COUNT over no matches = 0, MAX = NULL) via coalesce.
    """
    prof = user_profiles(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    ev_agg = ev.groupBy("user_id").agg(
        F.count("event_type").alias("_total_events"),
        F.countDistinct("event_type").alias("_unique_event_types"),
        F.max("ts").alias("last_activity"),
    )
    return prof.join(F.broadcast(ev_agg), "user_id", "left").select(
        "user_id",
        "name",
        "region",
        F.coalesce("_total_events", F.lit(0)).alias("total_events"),
        F.coalesce("_unique_event_types", F.lit(0)).alias("unique_event_types"),
        "last_activity",
    )


# --- J2/J3+A6: region join agg — the flagship (PC:90-101) -------------------
def region_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN profiles→events then WHERE on the event side (the
    reference's inner-like left join, J2 — written as-is; Catalyst converts
    to inner + pushes the ts predicate into the fact scan)."""
    prof = user_profiles(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    joined = F.broadcast(prof).join(ev, prof.user_id == ev.user_id, "left")
    return (
        joined.filter(F.col("ts") >= _ts(CUTOFF_30D))
        .groupBy("region")
        .agg(
            F.count("event_type").alias("total_events"),
            F.countDistinct(ev.user_id).alias("unique_users"),
            F.round(
                F.avg(F.when(F.col("event_type") == "purchase", 1).otherwise(0)), 4
            ).alias("purchase_rate"),
        )
        .orderBy(F.desc("total_events"))
    )


# --- A11+A5: daily user stats (the MV body, PC:37-46) -----------------------
def daily_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    prof = user_profiles(spark, sf_dir).select("user_id", "region")
    ev = load(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(prof), "user_id")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "user_id", "region")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("event_type").alias("event_types"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "purchases"
            ),
        )
    )


# --- A12: re-aggregation of the materialized daily stats (PC:108-119) -------
def mv_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    mv = daily_user_stats(spark, sf_dir)
    return (
        mv.groupBy("event_date")
        .agg(
            F.sum("event_count").alias("total_events"),
            F.countDistinct("user_id").alias("active_users"),
            F.sum("purchases").alias("total_purchases"),
        )
        .orderBy(F.desc("event_date"))
    )


# --- A9+O1: event type distribution (PC:138-144) ----------------------------
def event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            det_avg("value", 4).alias("avg_value"),
        )
        .orderBy(F.desc("event_count"))
    )


# --- basic suite daily aggregation (RPT:145-155) ----------------------------
def daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.countDistinct("user_id").alias("unique_users"),
            det_avg("value", 4).alias("avg_value"),
        )
    )


# --- A7: per-type first/last event (RPT:184-194) ----------------------------
def event_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("event_count"),
        )
    )


# --- W1+F7: top-5 recent events per user, QUALIFY pattern (PC:163-172) ------
def top5_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = ev.withColumn("event_rank", F.row_number().over(w))
    return qualify(ranked, F.col("event_rank") <= 5).select(
        "user_id", "event_id", "event_type", "ts", "event_rank"
    )


# --- F7 at the SQL level: the reference's QUALIFY text, shimmed -------------
def top5_per_user_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's QUALIFY query (PC:163-172) as near-verbatim SQL text
    run through the Snowflake-dialect shim (dialect.translate rewrites
    QUALIFY → wrapped WHERE). Must hash-equal the DataFrame twin
    ``top5_per_user`` — same oracle."""
    from ..dialect import run_snowflake_sql

    load(spark, sf_dir, "events").createOrReplaceTempView("user_events_v")
    return run_snowflake_sql(
        spark,
        """
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS event_rank
        FROM user_events_v
        QUALIFY event_rank <= 5
        """,
    )


# --- W2: previous event per user via LAG (PC:169; RPT:205) ------------------
def prev_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_event_type"),
    )


# --- C2+W4+A8: the purchase funnel (RPT:213-243) ----------------------------
def purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-CTE funnel: per-user stage flags (MAX(CASE)) → conversion
    rates. Stages mapped onto the driver's event domain:
    view → click → signup → purchase."""
    ev = load(spark, sf_dir, "events")
    flag = lambda t: F.max(F.when(F.col("event_type") == t, 1).otherwise(0))
    per_user = ev.groupBy("user_id").agg(
        flag("view").alias("has_view"),
        flag("click").alias("has_click"),
        flag("signup").alias("has_signup"),
        flag("purchase").alias("has_purchase"),
    )
    pct = lambda num, den: F.round(100.0 * num / F.nullif(den, F.lit(0)), 2)
    viewed = F.sum("has_view")
    clicked = F.sum("has_click")
    signed = F.sum("has_signup")
    purchased = F.sum("has_purchase")
    return per_user.agg(
        F.count(F.lit(1)).alias("total_users"),
        viewed.alias("users_viewed"),
        clicked.alias("users_clicked"),
        signed.alias("users_signed_up"),
        purchased.alias("users_purchased"),
        pct(clicked, viewed).alias("view_to_click_rate"),
        pct(signed, clicked).alias("click_to_signup_rate"),
        pct(purchased, signed).alias("signup_to_purchase_rate"),
        pct(purchased, F.count(F.lit(1))).alias("overall_conversion_rate"),
    )


# --- C1+X5/X6/X12: compaction-benefit analysis (PC:216-239) -----------------
def compaction_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date")).agg(
        F.count(F.lit(1)).alias("event_count")
    )
    est = F.ceil(F.col("event_count") / 100.0).cast("bigint")
    opt = F.ceil(F.col("event_count") / 1000.0).cast("bigint")
    out = stats.select(
        "event_date",
        "event_count",
        est.alias("estimated_small_files"),
        opt.alias("optimal_files"),
        F.when(
            est > 0, F.round(100.0 * (est - opt) / est.cast("double"), 2)
        )
        .otherwise(F.lit(0.0))
        .alias("file_reduction_pct"),
    )
    return out.filter(F.col("estimated_small_files") > F.col("optimal_files"))


# --- U1+S7/S8: hot/cold tier union (DR:197-209; P:936-952) ------------------
def hot_cold_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cut = _ts(CUTOFF_7D)
    hot = ev.filter(F.col("ts") >= cut).agg(
        F.count(F.lit(1)).alias("events"), F.countDistinct("user_id").alias("users")
    ).select(F.lit("hot").alias("tier"), "events", "users")
    cold = ev.filter(F.col("ts") < cut).agg(
        F.count(F.lit(1)).alias("events"), F.countDistinct("user_id").alias("users")
    ).select(F.lit("cold").alias("tier"), "events", "users")
    return hot.unionByName(cold)


# --- A13: distinct event types per user (P:753-766 core agg) ----------------
def event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # n_event_types = size of the collected set — NOT a separate
    # countDistinct, which would add the expand rewrite on top of the
    # object-agg buffer (one aggregation buffer instead of two paths)
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("arr"))
        .select(
            "user_id",
            F.array_join("arr", ",").alias("event_types_csv"),
            F.size("arr").alias("n_event_types"),
        )
    )


# --- X10: JSON properties decode (TF:119-127 vs GEN:142-143 duality) --------
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            det_avg(k, 4).alias("avg_k"),
            F.sum(F.when(k > 50, 1).otherwise(0)).alias("high_k_events"),
            F.count(F.lit(1)).alias("event_count"),
        )
    )


# --- X10 modern path: VARIANT decode (Spark 4 VariantType) -------------------
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The properties column through Spark 4's VARIANT type — the open
    binary semi-structured encoding Iceberg v3 standardizes, and the
    engine-native analogue of the VARIANT column the reference's
    Snowflake tables use for event properties. ``parse_json`` decodes
    each row ONCE into the binary form; typed paths come out with
    ``variant_get`` (no per-field string re-parse — at 100 TB this is
    the difference between one decode and one decode per extracted
    field), and absent paths go through ``try_variant_get``, whose
    NULL-never-error contract is counted to prove the path (always 0
    hits on this corpus). Aggregates match the string-path
    ``props_json_stats`` numbers, so the two decode routes certify each
    other; the oracle extracts via DuckDB's JSON path functions."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.does_not_exist", "string")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            det_avg("k", 4).alias("avg_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias(
                "high_k_events"
            ),
            F.count("m").alias("missing_path_hits"),
        )
        .orderBy("event_type")
    )


# --- X10 robustness: malformed-JSON rescue (PERMISSIVE ingest) ---------------
def props_malformed_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest robustness for the JSON properties column: 10% of rows are
    deterministically corrupted (closing brace dropped — hash-selected, so
    both engines corrupt the same rows), then parsed with ``from_json``,
    whose PERMISSIVE null-on-malformed is the rescue contract (Iceberg/
    Spark pipelines quarantine these rows rather than failing the job).
    Reports per-type parse failure counts and stats over the surviving
    rows — the shape of a quarantine-and-continue ingest audit."""
    ev = load(spark, sf_dir, "events")
    corrupt = F.expr("cast(conv(substr(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint)") % 10 == 0
    payload = F.when(
        corrupt, F.expr("substring(props, 1, length(props) - 1)")
    ).otherwise(F.col("props"))
    m = F.from_json(payload, "map<string,string>")
    k = m.getItem("k").cast("int")
    return ev.select("event_type", m.alias("m"), k.alias("k")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).alias("parse_failures"),
        det_avg(F.col("k"), 4).alias("avg_k_rescued"),
    )


# --- A15: percentiles of value per type (exact; approx variant below) -------
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90_value"),
        F.count(F.lit(1)).alias("event_count"),
    )


# --- X4: INTERVAL arithmetic + scalar subquery, via the SQL entry point -----
def events_last_week_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PC:130-style interval arithmetic, anchored to MAX(ts) (deterministic
    twin of CURRENT_TIMESTAMP - INTERVAL). Exercises the spark.sql() entry
    point (SURVEY §3.2) — same Catalyst plan as the DataFrame API."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS events,
               COUNT(DISTINCT user_id) AS unique_users
        FROM events_v
        WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events_v)
        GROUP BY event_type
        """
    )


# --- X10 (map view): typed map decode of the props JSON ---------------------
def props_map_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference declares properties as map<string,string> but stores
    JSON strings (TF:119-127 vs GEN:142-143). This is the map-typed view:
    from_json → element access."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        m.getItem("k").cast("int").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


# --- A14 + A3-approx: scale variants -----------------------------------------
def events_object_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG(OBJECT_CONSTRUCT(*)) parity (PC:16): rows→array-of-objects
    per user. Serialized canonically (``:``-joined fields, ``|``-joined
    sorted elements, value as DECIMAL(18,4) text) instead of JSON so the
    blob is engine-agnostic and fully oracle-hashable — JSON float/space
    formatting differs between engines, fixed-point decimal text does not."""
    ev = load(spark, sf_dir, "events")
    obj = F.concat_ws(
        ":",
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,4)"),
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_list(obj)), "|").alias(
                "events_blob"
            )
        )
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variants of A3/A15: HLL-sketch distinct counts and
    t-digest approximate percentiles (one pass each over the facts, no
    count-distinct expand, bounded memory). Sketch estimates are
    engine-specific, so the gate row carries the *accuracy contract*
    instead of the raw estimate: exact values (deterministic, oracle-
    checkable) plus booleans asserting |approx − exact| ≤ 5% — computed
    in-engine where both numbers are available. The exact columns exist
    for the gate only; production keeps the one-pass sketch plan."""
    ev = load(spark, sf_dir, "events")
    # Two aggregations, NOT one: COUNT(DISTINCT) triggers Catalyst's
    # expand rewrite, and percentile_approx's QuantileSummaries buffer
    # inside that expanded/sort-aggregated stream was measured 10x slower
    # (4.2s vs 0.3+0.3s at sf0.1). Keeping the sketch aggregates in a
    # plain hash agg and the distinct in its own pass, then joining the
    # |event_type|-row results, is strictly cheaper at every scale.
    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.count(F.lit(1)).alias("event_count"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    agg = sketches.join(F.broadcast(exact), "event_type")
    return agg.select(
        "event_type",
        "event_count",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("approx_users_ok"),
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= 0.05 * F.abs(F.col("exact_p50")) + F.lit(1e-6)
        ).alias("approx_p50_ok"),
    )


# --- sessionization: gap-based sessions (W2 applied; streaming twin in
# --- streaming/jobs — the batch shape of applyInPandasWithState) ------------
SESSION_GAP_HOURS = 6


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap since
    the user's previous event exceeds SESSION_GAP_HOURS. Classic LAG +
    running-SUM-of-flags; one shuffle on user_id serves both windows (same
    partition key), then a partial-agg groupBy on the same key — zero
    extra exchanges (verified via plans.count_exchanges)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast→timestamp first: NTZ-safe (identity when ts is already LTZ)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > SESSION_GAP_HOURS * 3600), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "event_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("total_events"),
            F.round(
                F.count(F.lit(1)) / F.max("session_seq"), 4
            ).alias("events_per_session"),
        )
    )


QUERIES = {
    "count_all": count_all,
    "filtered_counts_7d": filtered_counts_7d,
    "activity_summary": activity_summary,
    "region_join_agg": region_join_agg,
    "daily_user_stats": daily_user_stats,
    "mv_reagg": mv_reagg,
    "event_type_counts": event_type_counts,
    "daily_counts": daily_counts,
    "event_minmax": event_minmax,
    "top5_per_user": top5_per_user,
    "top5_per_user_sql": top5_per_user_sql,
    "prev_event": prev_event,
    "purchase_funnel": purchase_funnel,
    "compaction_analysis": compaction_analysis,
    "hot_cold_union": hot_cold_union,
    "event_types_per_user": event_types_per_user,
    "props_json_stats": props_json_stats,
    "props_variant_stats": props_variant_stats,
    "props_malformed_rescue": props_malformed_rescue,
    "value_percentiles": value_percentiles,
    "events_last_week_interval": events_last_week_interval,
    "props_map_decode": props_map_decode,
    "events_object_agg": events_object_agg,
    "approx_distinct_users": approx_distinct_users,
    "user_sessions": user_sessions,
}

ORACLE = {
    "count_all": "SELECT COUNT(*) AS cnt FROM events",
    "user_sessions": f"""
        WITH flagged AS (
            SELECT user_id,
                   CASE WHEN prev_s IS NULL
                             OR s - prev_s > {SESSION_GAP_HOURS * 3600}
                        THEN 1 ELSE 0 END AS new_sess
            FROM (
                SELECT user_id,
                       CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
                       LAG(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           AS prev_s
                FROM events
            )
        )
        SELECT user_id,
               CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
               COUNT(*) AS total_events,
               ROUND(COUNT(*) / CAST(SUM(new_sess) AS DOUBLE), 4)
                   AS events_per_session
        FROM flagged GROUP BY user_id
    """,
    "value_percentiles": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50_value,
               ROUND(quantile_cont(value, 0.9), 4) AS p90_value,
               COUNT(*) AS event_count
        FROM events GROUP BY event_type
    """,
    "events_last_week_interval": """
        SELECT event_type, COUNT(*) AS events,
               COUNT(DISTINCT user_id) AS unique_users
        FROM events
        WHERE ts >= (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 7 DAY FROM events)
        GROUP BY event_type
    """,
    "props_map_decode": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
               CAST(len(json_keys(props)) AS INT) AS n_keys
        FROM events
    """,
    "filtered_counts_7d": f"""
        SELECT COUNT(*) AS total_events,
               COUNT(DISTINCT user_id) AS unique_users,
               COUNT(DISTINCT event_type) AS event_types
        FROM events WHERE ts >= {_TS7}
    """,
    "activity_summary": f"""
        SELECT pr.user_id, pr.name, pr.region,
               COUNT(e.event_type) AS total_events,
               COUNT(DISTINCT e.event_type) AS unique_event_types,
               CAST(MAX(e.ts) AS TIMESTAMP) AS last_activity
        FROM {PROFILES_SQL} pr
        LEFT JOIN events e ON pr.user_id = e.user_id
        GROUP BY pr.user_id, pr.name, pr.region
    """,
    "region_join_agg": f"""
        SELECT pr.region,
               COUNT(e.event_type) AS total_events,
               COUNT(DISTINCT e.user_id) AS unique_users,
               ROUND(AVG(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END), 4)
                   AS purchase_rate
        FROM {PROFILES_SQL} pr
        LEFT JOIN events e ON pr.user_id = e.user_id
        WHERE e.ts >= {_TS30}
        GROUP BY pr.region
    """,
    "daily_user_stats": f"""
        SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS event_date, e.user_id, pr.region,
               COUNT(*) AS event_count,
               COUNT(DISTINCT e.event_type) AS event_types,
               CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        FROM events e JOIN {PROFILES_SQL} pr ON e.user_id = pr.user_id
        GROUP BY 1, 2, 3
    """,
    "mv_reagg": f"""
        WITH mv AS (
            SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS event_date, e.user_id,
                   COUNT(*) AS event_count,
                   CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS BIGINT) AS purchases
            FROM events e JOIN {PROFILES_SQL} pr ON e.user_id = pr.user_id
            GROUP BY 1, 2
        )
        SELECT event_date,
               CAST(SUM(event_count) AS BIGINT) AS total_events,
               COUNT(DISTINCT user_id) AS active_users,
               CAST(SUM(purchases) AS BIGINT) AS total_purchases
        FROM mv GROUP BY event_date
    """,
    "event_type_counts": """
        SELECT event_type, COUNT(*) AS event_count,
               {AVG_VALUE} AS avg_value
        FROM events GROUP BY event_type
    """,
    "daily_counts": """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, COUNT(*) AS events,
               COUNT(DISTINCT user_id) AS unique_users,
               {AVG_VALUE} AS avg_value
        FROM events GROUP BY 1
    """,
    "event_minmax": """
        SELECT event_type,
               CAST(MIN(ts) AS TIMESTAMP) AS first_event,
               CAST(MAX(ts) AS TIMESTAMP) AS last_event,
               COUNT(*) AS event_count
        FROM events GROUP BY event_type
    """,
    "top5_per_user": """
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_rank
        FROM (
            SELECT user_id, event_id, event_type, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS event_rank
            FROM events
        ) WHERE event_rank <= 5
    """,
    "prev_event": """
        SELECT user_id, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_event_type
        FROM events
    """,
    "purchase_funnel": """
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
                   MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
            FROM events GROUP BY user_id
        )
        SELECT COUNT(*) AS total_users,
               CAST(SUM(has_view) AS BIGINT) AS users_viewed,
               CAST(SUM(has_click) AS BIGINT) AS users_clicked,
               CAST(SUM(has_signup) AS BIGINT) AS users_signed_up,
               CAST(SUM(has_purchase) AS BIGINT) AS users_purchased,
               ROUND(100.0 * SUM(has_click) / NULLIF(SUM(has_view), 0), 2)
                   AS view_to_click_rate,
               ROUND(100.0 * SUM(has_signup) / NULLIF(SUM(has_click), 0), 2)
                   AS click_to_signup_rate,
               ROUND(100.0 * SUM(has_purchase) / NULLIF(SUM(has_signup), 0), 2)
                   AS signup_to_purchase_rate,
               ROUND(100.0 * SUM(has_purchase) / NULLIF(COUNT(*), 0), 2)
                   AS overall_conversion_rate
        FROM per_user
    """,
    "compaction_analysis": """
        WITH file_stats AS (
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, COUNT(*) AS event_count
            FROM events GROUP BY 1
        ), est AS (
            SELECT event_date, event_count,
                   CAST(CEIL(event_count / 100.0) AS BIGINT) AS estimated_small_files,
                   CAST(CEIL(event_count / 1000.0) AS BIGINT) AS optimal_files
            FROM file_stats
        )
        SELECT event_date, event_count, estimated_small_files, optimal_files,
               CASE WHEN estimated_small_files > 0
                    THEN ROUND(100.0 * (estimated_small_files - optimal_files)
                               / CAST(estimated_small_files AS DOUBLE), 2)
                    ELSE 0.0 END AS file_reduction_pct
        FROM est
        WHERE estimated_small_files > optimal_files
    """,
    "hot_cold_union": f"""
        SELECT 'hot' AS tier, COUNT(*) AS events, COUNT(DISTINCT user_id) AS users
        FROM events WHERE ts >= {_TS7}
        UNION ALL
        SELECT 'cold' AS tier, COUNT(*) AS events, COUNT(DISTINCT user_id) AS users
        FROM events WHERE ts < {_TS7}
    """,
    "event_types_per_user": """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                   AS event_types_csv,
               COUNT(DISTINCT event_type) AS n_event_types
        FROM events GROUP BY user_id
    """,
    "props_malformed_rescue": """
        WITH corrupted AS (
            SELECT event_type,
                   CASE WHEN CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
                        THEN substring(props, 1, length(props) - 1)
                        ELSE props END AS payload
            FROM events
        ),
        parsed AS (
            SELECT event_type,
                   CASE WHEN json_valid(payload) THEN payload END AS ok,
                   CASE WHEN json_valid(payload)
                        THEN CAST(json_extract_string(payload, '$.k') AS INTEGER)
                   END AS k
            FROM corrupted
        )
        SELECT event_type,
               COUNT(*) AS total_rows,
               CAST(SUM(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS parse_failures,
               ROUND(CAST(SUM(CAST(k AS DECIMAL(28,8))) AS DOUBLE) / COUNT(k), 4)
                   AS avg_k_rescued
        FROM parsed GROUP BY event_type
    """,
    "props_variant_stats": """
        SELECT event_type,
               COUNT(*) AS event_count,
               {AVG_K} AS avg_k,
               CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
                                       AS INTEGER) > 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_k_events,
               CAST(COUNT(json_extract_string(props, '$.does_not_exist'))
                   AS BIGINT) AS missing_path_hits
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "props_json_stats": """
        SELECT event_type,
               {AVG_K} AS avg_k,
               CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_k_events,
               COUNT(*) AS event_count
        FROM events GROUP BY event_type
    """,
    # canonical serialization: same ':'/'|' joins, same DECIMAL(18,4) text,
    # same binary string sort on both engines → full value-hash equality
    "events_object_agg": """
        SELECT user_id,
               string_agg(s, '|' ORDER BY s) AS events_blob
        FROM (
            SELECT user_id,
                   concat_ws(':', event_id, event_type,
                             CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR)) AS s
            FROM events
        ) GROUP BY user_id
    """,
    # the sketch estimates are engine-specific; the gate checks the exact
    # columns plus the in-engine accuracy booleans (TRUE = within 5%)
    "approx_distinct_users": """
        SELECT event_type,
               COUNT(*) AS event_count,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS approx_users_ok,
               TRUE AS approx_p50_ok
        FROM events GROUP BY event_type
    """,
}


_AVG_VALUE = det_avg_sql("value", 4)
_AVG_K = det_avg_sql("CAST(json_extract_string(props, '$.k') AS INTEGER)", 4)
ORACLE = {
    k: v.replace("{AVG_VALUE}", _AVG_VALUE).replace("{AVG_K}", _AVG_K)
    for k, v in ORACLE.items()
}

# the SQL-shim twin must produce byte-identical results
ORACLE["top5_per_user_sql"] = ORACLE["top5_per_user"]
