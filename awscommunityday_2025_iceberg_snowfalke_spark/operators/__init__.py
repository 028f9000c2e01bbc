"""Operator corpus.

Each submodule exposes:
    QUERIES: dict[str, Callable[(SparkSession, sf_dir), DataFrame]]
    ORACLE:  dict[str, str]   # duckdb-runnable ANSI SQL twins (subset)

``all_queries()`` / ``all_oracle()`` merge every submodule for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import (
        analytics,
        dedup,
        lifecycle,
        multimodal,
        pipeline,
        relational,
        similarity,
        snowsql,
        temporal,
        textstats,
        tpch,
    )
    from ..sources import pyds, writers
    from ..streaming import jobs as streaming_jobs
    from .. import governance, mv, plans, scale

    # Module order only decides the ordering of entries NOT named in
    # _GATE_FRONT below (the driver's gate samples the first 50 entries of
    # all_queries(); _GATE_FRONT pins those by name, at finer granularity
    # than whole modules). The local gate (tests/test_corpus) still checks
    # ALL entries every round regardless of order.
    return (
        dedup,
        similarity,
        textstats,
        pipeline,
        temporal,
        multimodal,
        lifecycle,
        governance,
        writers,
        streaming_jobs,
        pyds,
        mv,
        scale,
        plans,
        analytics,
        relational,
        snowsql,
        tpch,
    )


# The driver's correctness gate samples the FIRST 50 entries of
# all_queries() each round; this list is rotated per round so every entry
# eventually gets a driver CORRECTNESS row. History: r1-r4 sampled
# relational/snowsql/tpch (driver-green by r04); r5 sampled
# dedup/similarity/textstats/pipeline/temporal/multimodal/lifecycle (48/50
# green; the 2 multimodal ERRORs are fixed and re-queued below). r6
# front-loads the 27 never-sampled entries (governance, writers, streaming,
# pyds, mv, scale, plans, the analytics family) + clustering_skipping_report
# (missed r5's cut at slot 51) + the never-driver-green relational trio
# (user_sessions post-NTZ-fix, events_object_agg, approx_distinct_users —
# oracles added in r5, never driver-exercised) + the two re-serialized
# multimodal entries, then fills to 50 with the longest-unsampled
# relational entries (last sampled r1-r3).
_GATE_FRONT = (
    # never driver-sampled: governance(2), writers(3), streaming(7),
    # pyds(1), mv(1), scale(1), plans(1), analytics(15)
    "masked_profiles",
    "masked_profiles_admin",
    "csv_roundtrip_profiles",
    "hot_tier_ctas",
    "partition_pruned_scan",
    "streaming_event_counts",
    "streaming_dedup_events",
    "streaming_daily_windows",
    "dynamic_table_user_engagement",
    "streaming_user_sessions",
    "small_file_lifecycle_report",
    "streaming_session_windows",
    "pyds_snapshot_scan",
    "mv_daily_user_stats",
    "bucketed_user_join",
    "query_history",
    "event_rank_dense",
    "table_profile_events",
    "heavy_hitter_users",
    "value_stats_by_type",
    "event_lead_ntile",
    "moving_avg_value",
    "running_total_per_user",
    "rollup_type_daily",
    "cube_type_band",
    "grouping_sets_type_or_day",
    "daily_purchase_signup_reconciliation",
    "pivot_user_event_values",
    "hll_user_rollup",
    "dq_expectations",
    "rolling_1h_event_count",
    "clustering_skipping_report",
    # fixed this round (r5 driver ERROR: array canonicalization)
    "multimodal_byte_histogram",
    "multimodal_embed",
    # oracled in r5 but never driver-exercised / not re-verified post-fix
    "user_sessions",
    "events_object_agg",
    "approx_distinct_users",
    # longest-unsampled relational (r1-r3 vintage driver rows)
    "count_all",
    "filtered_counts_7d",
    "activity_summary",
    "region_join_agg",
    "daily_user_stats",
    "mv_reagg",
    "event_type_counts",
    "daily_counts",
    "event_minmax",
    "top5_per_user",
    "top5_per_user_sql",
    "prev_event",
    "purchase_funnel",
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(getattr(mod, "QUERIES", {}))
    front = {n: merged[n] for n in _GATE_FRONT if n in merged}
    front.update((n, f) for n, f in merged.items() if n not in front)
    return front


def all_oracle() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(getattr(mod, "ORACLE", {}))
    return merged
