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
# r9 (this rotation) front-loads, per VERDICT r8 ask 1, the entries with
# NO driver CORRECTNESS row yet plus the stalest vintage:
# (a) the THIRTY round-9 additions (exact-substring dedup family ×3,
#     IVF-PQ family ×3, streaming MERGE upsert, Gopher rules, bigram LM,
#     b-bit minhash, range search, MMR, DSIR selection, length outliers,
#     BPE encode, temperature reweight, GROUPING SETS, Kneser-Ney,
#     vocab OOV + coverage curve, negative sampling, snapshot changelog,
#     pHash Hamming pairs, approx top-k, truncation recall, method
#     agreement, partition evolution, FLATTEN, WAP, MOR deletes);
# (b) two entries CHANGED this round whose driver rows predate the
#     change (minhash_lsh_pairs' integer predicate; the dsir shared-core
#     refactor — doc_domain_mixture's change was plan-only, its r7 value
#     evidence stands);
# (c) the eighteen r8 extension additions, judge-certified in r8 but
#     never driver-sampled (COVERAGE.md's r9 queue);
# the eighteen r5-vintage + seven r6-vintage stale rows all queue for
# r10 (list in COVERAGE.md).
# 30 + 2 + 18 = 50 exactly (test_registry pins the arithmetic).
_GATE_FRONT = (
    # (a) round-9 additions
    "dedup_exact_substrings",
    "dedup_substring_removal_report",
    "benchmark_contamination_substrings",
    "ann_ivf_pq_cosine",
    "ann_ivf_pq_recall_report",
    "embedding_pq_codes",
    "streaming_merge_upsert",
    "gopher_quality_rules",
    "bigram_logprob_score",
    "minhash_b_bit_accuracy",
    "ann_range_search_cosine",
    "mmr_diverse_topk",
    "dsir_select_threshold",
    "doc_length_outliers",
    "bpe_encode_fixed_merges",
    "domain_temperature_reweight",
    "grouping_sets_type_dow",
    "kneser_ney_bigram_score",
    "vocab_oov_rate",
    "snapshot_changelog",
    "multimodal_phash_hamming_pairs",
    "approx_topk_users",
    "embedding_truncation_recall",
    "dedup_method_agreement",
    "vocab_coverage_curve",
    "negative_sampling_weights",
    "partition_evolution_scan",
    "snowsql_flatten_event_types",
    "wap_publish_audit",
    "mor_delete_events",
    # (b) changed this round — driver rows predate the change
    "minhash_lsh_pairs",
    "dsir_importance_weights",
    # (c) r8 extension additions, never driver-sampled
    "dedup_editdist_verify",
    "minhash_estimate_accuracy",
    "dedup_keep_best_quality",
    "jaccard_threshold_sweep",
    "source_overlap_matrix",
    "pmi_collocations",
    "doc_lang_confusion",
    "source_quality_report",
    "lang_char_entropy",
    "doc_length_histogram",
    "bpe_first_merges",
    "epoch_shard_assignment",
    "knn_graph_degree_stats",
    "event_percent_rank",
    "cdc_scd2_user_value",
    "pseudonymized_join_audit",
    "streaming_cdc_latest_events",
    "unpivot_user_event_values",
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
