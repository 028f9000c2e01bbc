#!/usr/bin/env python
"""Interleaved ONE-SESSION A/B of the quality-classifier training+scoring
paths (r16 batch 2): the r15 shape (staged matrix -> _qc_weights' eager
totals collect + join-time counts recompute -> _qc_scored broadcast join)
vs the r16 shape (staged matrix -> _qc_weight_arrays single collect ->
_qc_scored against the rebuilt local-relation weights). Rounds alternate
inside one session — the only honest timing this host's ±2x session-level
CPU swing allows.

A third variant measured here and REJECTED (kept for the record): scoring
the built matrix via element_at on 2048-slot array literals read
2.6-3.0 s vs 0.7-1.1 s for the broadcast join — the array-literal device
only pays when fused into a scan a join would force through an exchange
(the curation stage-4 shape), not on an already-built matrix.

Usage: python tools/ab_qc_paths.py [rounds]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awscommunityday_2025_iceberg_snowfalke_spark.operators.textstats import (  # noqa: E402
    _qc_features,
    _qc_scored,
    _qc_weight_arrays,
    _qc_weights,
    _qc_weights_relation,
)
from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402
from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load  # noqa: E402
from awscommunityday_2025_iceberg_snowfalke_spark.stage import stage  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_qc_paths")

    def docs():
        return load(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )

    def old_path():
        feats = stage(_qc_features(docs()))
        weights = _qc_weights(feats)  # eager tot collect inside
        _qc_scored(feats, weights).write.format("noop").mode(
            "overwrite"
        ).save()

    def new_path():
        feats = stage(_qc_features(docs()))
        w6, present = _qc_weight_arrays(feats)
        _qc_scored(
            feats, _qc_weights_relation(spark, w6, present)
        ).write.format("noop").mode("overwrite").save()

    # untimed staging round for both sides
    old_path()
    new_path()
    olds, news = [], []
    for i in range(rounds):
        spark.sparkContext.setJobDescription(f"old#{i}")
        t0 = time.perf_counter()
        old_path()
        olds.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(f"new#{i}")
        t0 = time.perf_counter()
        new_path()
        news.append(round(time.perf_counter() - t0, 3))
    print("old(3 matrix passes):", olds, "min", min(olds))
    print("new(2 matrix passes):", news, "min", min(news))


if __name__ == "__main__":
    main()
