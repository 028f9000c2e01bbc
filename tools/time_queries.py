#!/usr/bin/env python
"""Time a named subset of registered queries with bench.py's methodology
(one untimed staging pass, then min-of-N timed collects) — for isolating
optimization work without running the whole headline.

Usage: python tools/time_queries.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_BENCH_ATTEMPTS (default 3), SPARK_GRAFT_NOOP=1 to use the
     noop sink instead of collect() (guide §1.4 isolation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awscommunityday_2025_iceberg_snowfalke_spark.operators import all_queries  # noqa: E402
from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    attempts_n = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    noop = bool(os.environ.get("SPARK_GRAFT_NOOP"))
    spark = get_spark(app_name="time_queries")
    qs = all_queries()

    def run(name: str) -> None:
        df = qs[name](spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"stage:{name}")
        t0 = time.perf_counter()
        try:
            run(name)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            print(name, out[name], flush=True)
            continue
        staging = round(time.perf_counter() - t0, 3)
        att = []
        for i in range(attempts_n):
            spark.sparkContext.setJobDescription(f"timed:{name}#{i}")
            t0 = time.perf_counter()
            run(name)
            att.append(round(time.perf_counter() - t0, 3))
        out[name] = {"seconds": min(att), "attempts": att, "staging": staging}
        print(name, out[name], flush=True)
    print(json.dumps({n: v.get("seconds") for n, v in out.items()}))


if __name__ == "__main__":
    main()
