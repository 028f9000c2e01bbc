"""Registry hygiene: with 186 entries the gate-rotation bookkeeping is
past hand-auditability — these tests make the invariants mechanical.

- `_GATE_FRONT` (the driver-gate rotation pin) must name real entries,
  without duplicates, and fill the driver's 50-row sample exactly;
- no two modules may register the same query name (dict.update order
  would silently shadow one implementation with another);
- every oracle key must have a query (the driver joins on name);
- COVERAGE.md's backticked operator names must resolve to registry
  entries (stale docs send the judge to entries that don't exist).
"""

import os
import re

from awscommunityday_2025_iceberg_snowfalke_spark.operators import (
    _GATE_FRONT,
    _modules,
    all_oracle,
    all_queries,
)

# backticked snake_case identifiers in COVERAGE.md that are legitimately
# NOT registry entries (helper functions, schema columns, Spark APIs)
_COVERAGE_NON_ENTRIES = {
    "append_to_branch",  # SnapshotTable branch method
    "approx_top_k",  # pyspark.sql function API
    "create_branch",  # SnapshotTable branch method
    "create_tag",  # SnapshotTable tag method
    "fast_forward",  # SnapshotTable publish method
    "dv_ok",  # invariant column of dv_delete_events
    "ext_user_events",  # temp-view name in the external-scan narrative
    "gopher_ok",  # composite flag column of gopher_quality_rules
    "kmeans_ivf_cells",  # helper behind kmeans_ivf_train
    "l_commitdate",  # TPC-H column the driver schema lacks
    "read_staged",  # SnapshotTable WAP method
    "refresh_incremental",  # MaterializedView method
    "unigram_train",  # trainer library function behind the frozen artifact
    "evolve_partition_spec",  # SnapshotTable spec-evolution method
    "widen_column_type",  # SnapshotTable type-promotion method
    "add_column_default",  # SnapshotTable initial-default method
    "rewrite_preserving_lineage",  # SnapshotTable lineage rewrite method
    "write_column_stats",  # SnapshotTable ANALYZE/Puffin method
    "merge_full",  # SnapshotTable full-sync MERGE method
    "expire_snapshots",  # SnapshotTable T6 method
    "file_seqs",  # manifest field (sequence numbers)
    "file_specs",  # manifest field (per-file partition-spec lineage)
    "plan_scan_manifests",  # SnapshotTable planning method
    "refresh_partitions",  # MaterializedView method
    "stats_col",  # SnapshotTable constructor arg
    "rollback_to",  # SnapshotTable method
    "rollback_to_snapshot",  # Iceberg procedure name in prose
    "session_window",  # pyspark.sql.functions API
    "streaming_tws_dedup",  # environment-gated entry (registers when protobuf exists)
    "user_profiles",  # reference table name
}


def test_gate_front_resolves_and_is_unique():
    qs = all_queries()
    missing = [n for n in _GATE_FRONT if n not in qs]
    assert not missing, f"_GATE_FRONT names without an entry: {missing}"
    dupes = {n for n in _GATE_FRONT if _GATE_FRONT.count(n) > 1}
    assert not dupes, f"_GATE_FRONT duplicates: {dupes}"
    assert len(_GATE_FRONT) == 50, (
        f"_GATE_FRONT has {len(_GATE_FRONT)} names; the driver samples the "
        "first 50 entries — pin exactly 50 so the sample is fully chosen"
    )
    # the rotation must stay ordered first in the merged dict
    assert list(qs)[: len(_GATE_FRONT)] == list(_GATE_FRONT)


def test_no_cross_module_name_collisions():
    seen: dict[str, str] = {}
    collisions = []
    for mod in _modules():
        for name in getattr(mod, "QUERIES", {}):
            if name in seen:
                collisions.append((name, seen[name], mod.__name__))
            seen[name] = mod.__name__
    assert not collisions, collisions


def test_every_oracle_has_a_query():
    qs, oracle = all_queries(), all_oracle()
    orphans = sorted(set(oracle) - set(qs))
    assert not orphans, f"oracles without a queries() entry: {orphans}"


def test_coverage_md_names_resolve():
    qs = all_queries()
    text = open(
        os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    ).read()
    names = {
        t
        for t in re.findall(r"`([a-z][a-z0-9_]*)`", text)
        if "_" in t and t not in _COVERAGE_NON_ENTRIES
    }
    stale = sorted(n for n in names if n not in qs)
    assert not stale, f"COVERAGE.md names without a registry entry: {stale}"
