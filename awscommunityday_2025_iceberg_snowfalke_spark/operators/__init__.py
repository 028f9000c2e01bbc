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
        parity,
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
        parity,
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
# relational/snowsql/tpch; r5 sampled the extension families; r6 sampled
# the 27 never-sampled entries + fixes + the r1-r3 relational tail (50/50
# green); r7 sampled the 16 post-r6 additions + the entire r4-vintage
# relational/snowsql/tpch tail (47/50 — quality_filter_funnel and the
# quota pair were driver-red on cross-engine numeric fragility).
# r10 (this rotation) front-loads:
# (a) the TWENTY-ONE entries with NO driver CORRECTNESS row — sixteen
#     r10 additions (OPQ allocation family ×3, hybrid RRF search,
#     snapshot branches/tags, MOR position deletes, MOR merge, rollback,
#     mixture plan, streaming watermark late-drop, stream-stream
#     interval join, substring-removal transform, dup-graph triangle
#     census, embedding drift report, the IFF/DATEADD/LISTAGG worksheet
#     entry, the LEFT OUTER stream-stream join) and five late-r9
#     additions that landed after r9's final rotation
#     (streaming_wap_publish, mv_changelog_refresh, pack_docs_placement,
#     doc_token_chunks, quality_method_agreement);
# (b) seven entries CHANGED this round whose r9 driver rows predate the
#     change: snapshot_changelog + mor_delete_events (changelog now
#     applies v_to's tombstones to the added side; rewrite-vs-MOR-delete
#     conflicts), snowsql_flatten_event_types (FLATTEN balanced-paren
#     scanner), wap_publish_audit (orphan GC now scans branch manifests),
#     and the IVF-PQ trio (_pq_topk grew the subidx hook — behavior-
#     identical by default, re-certify anyway);
# (c) FIFTEEN r5-vintage rows (COVERAGE.md's r10 queue minus the three
#     multimodal rows resize/frame_sample/audio_chunks, displaced by the
#     late additions — multimodal_ingest stays and the local gate
#     certifies all of them every round);
# (d) SEVEN r6-vintage rows — the sources/streaming/governance/MV spine
#     entries named in COVERAGE.md's r10 queue.
# 21 + 7 + 15 + 7 = 50 exactly (test_registry pins the arithmetic).
# Remaining r6 vintage (~36) + the r7 relational/snowsql/tpch tail queue
# for r11 (list in COVERAGE.md).
_GATE_FRONT = (
    # (a) never driver-sampled
    "embedding_opq_permutation",
    "ann_ivf_opq_cosine",
    "ann_ivf_opq_recall_report",
    "hybrid_search_rrf",
    "snapshot_branch_tag",
    "mor_position_delete_events",
    "merge_upsert_mor_events",
    "snapshot_rollback_events",
    "token_budget_mixture_plan",
    "streaming_watermark_late_drop",
    "streaming_interval_join_purchase_signup",
    "dedup_substring_removed_text",
    "dedup_graph_triangle_stats",
    "embedding_drift_report",
    "snowsql_iff_dateadd_span",
    "streaming_interval_join_left_outer",
    "streaming_wap_publish",
    "mv_changelog_refresh",
    "pack_docs_placement",
    "doc_token_chunks",
    "quality_method_agreement",
    # (b) changed this round — driver rows predate the change
    "snapshot_changelog",
    "mor_delete_events",
    "snowsql_flatten_event_types",
    "wap_publish_audit",
    "ann_ivf_pq_cosine",
    "ann_ivf_pq_recall_report",
    "embedding_pq_codes",
    # (c) r5-vintage
    "cdc_latest_events",
    "word_doc_frequency_topk",
    "doc_top_terms",
    "purchasers_without_errors",
    "purchasers_with_signup",
    "hourly_gapfill",
    "training_export_manifest",
    "asof_purchase_signup",
    "purchases_within_hour_of_signup",
    "multimodal_ingest",
    "lifecycle_snapshot_counts",
    "merge_upsert_events",
    "zorder_clustering_report",
    "schema_evolution_read",
    "file_skipping_report",
    # (d) r6-vintage spine + next-stalest
    "pyds_snapshot_scan",
    "mv_daily_user_stats",
    "dynamic_table_user_engagement",
    "streaming_event_counts",
    "small_file_lifecycle_report",
    "query_history",
    "masked_profiles",
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
