#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/r16/.

Usage: python tools/dump_r17_plans.py SUFFIX name1 name2 ...
Writes plans/r16/<name>_<SUFFIX>.txt for each query (SUFFIX = before|after).
Driver-loop trainers explain only their final frame — still captured, the
loop-shape evidence lives in OPTIMIZATION_r16.md.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awscommunityday_2025_iceberg_snowfalke_spark.operators import all_queries  # noqa: E402
from awscommunityday_2025_iceberg_snowfalke_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="dump_r17_plans")
    qs = all_queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r17",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue().strip()
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            text = f"ERROR building plan: {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {suffix} ({SF})\n\n{text}\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
