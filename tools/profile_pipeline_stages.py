#!/usr/bin/env python
"""Stage-wise wall-clock of curation_pipeline_v2 over any sf_dir.

The pipeline checkpoints through the eager ``stage()`` barrier (the write
is an action), so wrapping that one symbol times every stage boundary:
each boundary's elapsed covers all compute since the previous barrier —
the stage's own work plus its parquet write. The label list below maps
the pipeline's barrier ORDER (multiple barriers inside one conceptual
stage get sub-labels); keep it in sync with curation_pipeline_v2's
``# -- stage N`` comments.

Usage: python tools/profile_pipeline_stages.py <sf_dir>
Prints one JSON line with labeled boundary timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402
from awscommunityday_2025_iceberg_snowfalke_spark.operators import pipeline as P  # noqa: E402

# barrier order inside curation_pipeline_v2 (one label per stage() call)
LABELS = [
    "s1a_paragraph_rebuild",
    "s1b_survivors",
    "s2a_standing_digests",  # inner barrier, evaluated before the flags
    "s2b_bloom_flags",
    "s2c_exact_dedup",
    "s3a_lsh_candidates",  # inner barrier of the banding screen
    "s3b_verified_pairs",
    "s3c_neardup_drop",
    "s4a_classifier_train_feats",
    "s4b_classifier_scored",
    "s4c_quality_gate",
    "s5a_contaminated_ids",
    "s5b_decontaminated",
    "s6_mixture_admission",
    # s7 packing + the final report agg land in tail_after_last_barrier
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stage_profile")
    real_stage = P.stage
    marks: list[float] = []
    last = [time.perf_counter()]

    def timed(df, name=None):
        out = real_stage(df)
        now = time.perf_counter()
        marks.append(round(now - last[0], 2))
        last[0] = now
        return out

    P.stage = timed
    try:
        t0 = time.perf_counter()
        last[0] = t0
        P.curation_pipeline_v2(spark, sf).write.mode("overwrite").format(
            "noop"
        ).save()
        total = time.perf_counter() - t0
    finally:
        P.stage = real_stage
    labeled = {
        LABELS[i] if i < len(LABELS) else f"barrier_{i}": m
        for i, m in enumerate(marks)
    }
    labeled["tail_after_last_barrier"] = round(total - sum(marks), 2)
    print(
        json.dumps(
            {"sf_dir": sf, "total_sec": round(total, 2), "stages": labeled}
        )
    )


if __name__ == "__main__":
    main()
