"""Reference SQL corpus executed AS SQL through the dialect shim
(SURVEY §3.2 — entry point 2: the interactive worksheet path).

The DataFrame corpus (operators/relational.py) re-expresses each reference
query through the DataFrame API; these entries complement it by running the
*Snowflake-dialect SQL text itself* — QUALIFY, ``CURRENT_DATE - 7``
arithmetic, ``DATE(ts)``, ``INTERVAL`` literals — through
``dialect.translate`` + ``spark.sql``, over views named as the reference
names its tables (``ext_user_events`` performance_comparison.sql:14-21,
``user_profiles`` terraform/snowflake.tf:115-146). Same Catalyst plans as
the DataFrame twins; the point is proving the SQL surface end-to-end.

Determinism: ``CURRENT_DATE`` is pinned to ``dialect.ANCHOR_DATE``
(2024-01-31), one day past the driver's event window, so ``- 7`` lands on
the corpus-wide 2024-01-24 cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..dialect import run_snowflake_sql
from ..sources.registry import PROFILES_SQL, load, user_profiles


def _reference_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the driver tables under the reference's names/columns:
    ``ext_user_events`` (user_id, event_type, timestamp, properties, ...)
    and ``user_profiles`` (user_id, name, region, ...)."""
    load(spark, sf_dir, "events").selectExpr(
        "event_id",
        "user_id",
        "event_type",
        "ts AS timestamp",
        "props AS properties",
        "value",
    ).createOrReplaceTempView("ext_user_events")
    user_profiles(spark, sf_dir).createOrReplaceTempView("user_profiles")


# Snowflake-dialect texts (shapes from performance_comparison.sql; cited
# per entry). Dates intentionally CURRENT_DATE-relative — the shim pins them.
SNOW_SQL = {
    # PC:66-73 — "Filtered Query Performance": CURRENT_DATE - 7 arithmetic
    "snowsql_filtered_counts": """
        SELECT
            COUNT(*) as total_events,
            COUNT(DISTINCT user_id) as unique_users,
            COUNT(DISTINCT event_type) as event_types
        FROM ext_user_events
        WHERE timestamp >= CURRENT_DATE - 7
    """,
    # PC:37-46 — mv_daily_user_stats body: GROUP BY DATE(timestamp) expr
    "snowsql_daily_date_expr": """
        SELECT
            DATE(timestamp) as event_date,
            COUNT(*) as event_count,
            COUNT(DISTINCT user_id) as unique_users
        FROM ext_user_events
        GROUP BY DATE(timestamp)
    """,
    # PC:163-172 — "Window Function Performance": QUALIFY top-5 per user
    # (tiebreak on event_id added for deterministic comparison, SURVEY §5)
    "snowsql_qualify_top5": """
        SELECT
            user_id,
            event_id,
            event_type,
            timestamp,
            ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY timestamp DESC, event_id DESC) as event_rank
        FROM ext_user_events
        QUALIFY event_rank <= 5
    """,
    # PC:127-131 — INTERVAL arithmetic (the time-travel predicate's scalar
    # form) + PC:90-101 join shape: last-day activity per region
    "snowsql_interval_region": """
        SELECT
            p.region,
            COUNT(e.event_type) as total_events,
            COUNT(DISTINCT e.user_id) as active_users
        FROM user_profiles p
        LEFT JOIN ext_user_events e ON p.user_id = e.user_id
        WHERE e.timestamp >= CURRENT_DATE - INTERVAL '3 DAY'
        GROUP BY p.region
    """,
    # Snowflake's signature table function: build per-user arrays with
    # ARRAY_AGG(DISTINCT …), then LATERAL FLATTEN them back to rows —
    # the worksheet idiom for semi-structured/array columns. The shim
    # rewrites `, LATERAL FLATTEN(input => x) f` → LATERAL VIEW explode;
    # the per-user array order is engine-nondeterministic but the
    # explode→re-aggregate makes the result order-independent.
    "snowsql_flatten_event_types": """
        WITH per_user AS (
            SELECT user_id, ARRAY_AGG(DISTINCT event_type) AS types
            FROM ext_user_events
            GROUP BY user_id
        )
        SELECT f.value AS event_type, COUNT(*) AS n_users
        FROM per_user, LATERAL FLATTEN(input => per_user.types) f
        GROUP BY f.value
    """,
    # the remaining Snowflake worksheet staples in one query: IFF (the
    # shim's one rewrite → if()), unit-style DATEADD/DATEDIFF, LISTAGG
    # DISTINCT ... WITHIN GROUP, NVL, TO_VARCHAR(ts, fmt) — everything
    # but IFF parses NATIVELY in Spark 4, which is the point this entry
    # pins: the dialect shim stays one regex, not a SQL parser
    "snowsql_iff_dateadd_span": """
        SELECT
            event_type,
            COUNT(*) AS n_events,
            SUM(IFF(NVL(value, 0) >= 50, 1, 0)) AS n_hi,
            LISTAGG(DISTINCT IFF(NVL(value, 0) >= 50, 'hi', 'lo'), ',')
                WITHIN GROUP (ORDER BY IFF(NVL(value, 0) >= 50, 'hi', 'lo'))
                AS bands,
            DATEDIFF(day, MIN(timestamp), MAX(timestamp)) AS span_days,
            TO_VARCHAR(MIN(DATEADD(day, 7, timestamp)),
                       'yyyy-MM-dd HH:mm:ss') AS first_plus_week
        FROM ext_user_events
        GROUP BY event_type
    """,
    # Snowflake's VARIANT path access + :: cast — the worksheet way to
    # read the semi-structured properties column (the reference's tables
    # type it VARIANT). The shim maps `properties:k` →
    # get_json_object(properties, '$.k'); the ::INT cast suffix parses
    # natively in Spark 4. Exact: integer SUMs and counts only.
    "snowsql_variant_path": """
        SELECT
            event_type,
            COUNT(*) AS event_count,
            SUM(properties:k::INT) AS k_total,
            SUM(IFF(properties:k::INT > 50, 1, 0)) AS high_k_events
        FROM ext_user_events
        GROUP BY event_type
        ORDER BY event_type
    """,
}


def _make_query(sql: str, post=None):
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _reference_views(spark, sf_dir)
        df = run_snowflake_sql(spark, sql)
        return post(df) if post else df

    return _q


def _dates_as_iso(df: DataFrame) -> DataFrame:
    """Corpus convention (SURVEY §5): date columns compare as ISO strings."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType

    for f in df.schema.fields:
        if isinstance(f.dataType, DateType):
            df = df.withColumn(f.name, F.date_format(f.name, "yyyy-MM-dd"))
    return df


QUERIES = {
    name: _make_query(sql, post=_dates_as_iso) for name, sql in SNOW_SQL.items()
}

# duckdb twins with the anchor date inlined (duckdb would accept the pinned
# Spark text too, but spelling them out keeps the oracle independent of the
# shim under test). Timestamps are formatted to strings where the Spark
# side returns TimestampType — both sides emit identical ISO text.
ORACLE = {
    "snowsql_filtered_counts": """
        SELECT COUNT(*) AS total_events,
               COUNT(DISTINCT user_id) AS unique_users,
               COUNT(DISTINCT event_type) AS event_types
        FROM events
        WHERE ts >= DATE '2024-01-31' - 7
    """,
    "snowsql_daily_date_expr": """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
               COUNT(*) AS event_count,
               COUNT(DISTINCT user_id) AS unique_users
        FROM events
        GROUP BY 1
    """,
    "snowsql_qualify_top5": """
        SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS timestamp, event_rank
        FROM (
            SELECT user_id, event_id, event_type, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS event_rank
            FROM events
        ) WHERE event_rank <= 5
    """,
    "snowsql_interval_region": f"""
        SELECT p.region,
               COUNT(e.event_type) AS total_events,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM {PROFILES_SQL} p
        LEFT JOIN events e ON p.user_id = e.user_id
        WHERE e.ts >= DATE '2024-01-31' - INTERVAL '3 DAY'
        GROUP BY p.region
    """,
    "snowsql_flatten_event_types": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "snowsql_iff_dateadd_span": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN COALESCE(value, 0) >= 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
               string_agg(DISTINCT CASE WHEN COALESCE(value, 0) >= 50
                                        THEN 'hi' ELSE 'lo' END, ','
                          ORDER BY CASE WHEN COALESCE(value, 0) >= 50
                                        THEN 'hi' ELSE 'lo' END) AS bands,
               CAST(date_diff('day', MIN(ts), MAX(ts)) AS BIGINT)
                   AS span_days,
               STRFTIME(MIN(ts + INTERVAL 7 DAY), '%Y-%m-%d %H:%M:%S')
                   AS first_plus_week
        FROM events
        GROUP BY event_type
    """,
    "snowsql_variant_path": """
        SELECT event_type,
               COUNT(*) AS event_count,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                   AS BIGINT) AS k_total,
               CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
                                       AS INTEGER) > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_k_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
}
