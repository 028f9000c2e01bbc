#!/usr/bin/env python
"""Scale-smoke: run the events-based headline queries at 1x / 10x / 100x
the bench corpus and report wall-clock scaling.

The driver's largest testdata is sf0.1 (100 K events). This tool
synthesizes driver-schema events tables at arbitrary row counts with the
same shape (user cardinality, event-type domain, 30-day window, JSON
props) using deterministic spark.range expressions — no RNG state — then
times the per-family headline queries on each size. Near-linear (or
better) growth is the evidence that the plans are scan/shuffle-bound with
no hidden superlinear step; a query that grows faster than rows is a red
flag long before a real cluster run.

Usage:  python tools/scale_smoke.py [--sizes 100000,1000000,10000000]
Writes parquet under .scale_smoke/ (gitignored) and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402
from awscommunityday_2025_iceberg_snowfalke_spark.operators import all_queries  # noqa: E402

# events-only headline queries, one per plan family (daily_user_stats is
# excluded: it joins the customer/nation/region dims, which this tool does
# not synthesize — event_types_per_user covers its groupBy family)
QUERIES = [
    "count_all",            # scan + global agg
    "filtered_counts_7d",   # pushed filter + agg
    "event_type_counts",    # groupBy low-card
    "event_types_per_user", # groupBy high-card + collect_set
    "top5_per_user",        # per-user window
    "user_sessions",        # two windows + agg, one exchange
    "purchase_funnel",      # CTE + MAX-CASE flags
    "rolling_1h_event_count",  # RANGE-interval frame
    "cdc_latest_events",    # latest-per-key window
    "hll_user_rollup",      # sketch rollup + exact gate column
]


def synth_events(spark, n: int, out_dir: str) -> None:
    """Driver-schema events: (event_id, ts, user_id, event_type, value,
    props) with the testdata's distributions, scaled user cardinality
    (corpus/66 like sf0.1's 100 K rows / 1.5 K users)."""
    i = F.col("id")

    def u(salt: str):
        h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), i.cast("string"))), 1, 8), 16, 10)
        return h.cast("double") / float(0xFFFFFFFF)

    n_users = max(100, n // 66)
    day = (u("d") * 30).cast("int")
    sec = (u("s") * 86400).cast("int")
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        day, F.lit(0), F.lit(0), sec.cast("double")
    )
    et = (u("t") * 5).cast("int")
    event_type = (
        F.when(et == 0, "view").when(et == 1, "click").when(et == 2, "signup")
        .when(et == 3, "purchase").otherwise("error")
    )
    props = F.to_json(
        F.create_map(F.lit("k"), ((u("k") * 100).cast("int")).cast("string"))
    )
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism).select(
        i.alias("event_id"),
        ts.alias("ts"),
        ((u("u") * n_users).cast("long") + 1).alias("user_id"),
        event_type.alias("event_type"),
        (u("v") * 100).alias("value"),
        props.alias("props"),
    )
    df.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000,10000000")
    ap.add_argument("--keep", action="store_true", help="keep generated parquet")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark(app_name="scale_smoke")
    qs = all_queries()
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".scale_smoke")
    report: dict[str, dict] = {}
    for n in sizes:
        d = os.path.join(root, f"n{n}")
        synth_events(spark, n, d)
        # The noop sink executes the FULL query on the executors without
        # collecting results to the Python driver — .collect() of a
        # 10M-row result measures driver serialization, not the plan
        # (measured: rolling_1h "took" 391 s under collect, 2.5 s noop).
        def execute(q):
            qs[q](spark, d).write.mode("overwrite").format("noop").save()

        # warm-up pass compiles every query shape at this size's schema
        for q in QUERIES:
            try:
                execute(q)
            except Exception:
                pass
        for q in QUERIES:
            t0 = time.perf_counter()
            try:
                execute(q)
                report.setdefault(q, {})[str(n)] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                report.setdefault(q, {})[str(n)] = f"ERR {type(exc).__name__}"
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)

    # scaling factor per decade: t(10x)/t(x) — ≈10 is linear, <10 sublinear
    out = {"sizes": sizes, "seconds": report, "scaling": {}}
    for q, times in report.items():
        ratios = []
        for a, b in zip(sizes, sizes[1:]):
            ta, tb = times.get(str(a)), times.get(str(b))
            if isinstance(ta, float) and isinstance(tb, float) and ta > 0:
                ratios.append(round(tb / ta, 2))
        out["scaling"][q] = ratios
    print(json.dumps(out))


if __name__ == "__main__":
    main()
