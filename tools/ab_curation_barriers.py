#!/usr/bin/env python
"""Interleaved A/B of curation_pipeline_v2's survivor-set barriers
(r16-verdict "Next round" item 3): the committed layout stages every
stage boundary (A); the variant (B) drops the s3/s4/s5 survivor-set
parquet writes and lets their consumers re-derive them from the staged
s2 + decision artifacts. Both run alternately inside ONE SparkSession
(the ab_qc_paths.py discipline — cross-session numbers on this box are
noise), min-of-N rounds each, identical collects.

Usage: python tools/ab_curation_barriers.py [rounds]
Env: SPARK_GRAFT_SF_DIR (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awscommunityday_2025_iceberg_snowfalke_spark.operators.pipeline import (  # noqa: E402
    curation_pipeline_v2,
)
from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_curation_barriers")

    def run(staged: bool) -> float:
        t0 = time.perf_counter()
        rows = curation_pipeline_v2(
            spark, sf, _stage_survivor_sets=staged
        ).collect()
        assert len(rows) == 8
        return round(time.perf_counter() - t0, 3)

    # untimed staging pass per side (JIT/page-cache warmup)
    run(True)
    run(False)
    a, b = [], []
    sides = {}
    for i in range(rounds):
        spark.sparkContext.setJobDescription(f"A_staged#{i}")
        a.append(run(True))
        spark.sparkContext.setJobDescription(f"B_unstaged#{i}")
        b.append(run(False))
    # equality of the two variants' OUTPUT rows (same integers)
    ra = sorted(map(tuple, curation_pipeline_v2(spark, sf, True).collect()))
    rb = sorted(map(tuple, curation_pipeline_v2(spark, sf, False).collect()))
    sides["rows_equal"] = ra == rb
    sides["A_staged"] = {"attempts": a, "min": min(a)}
    sides["B_unstaged"] = {"attempts": b, "min": min(b)}
    print(json.dumps(sides))


if __name__ == "__main__":
    main()
