#!/usr/bin/env python
"""Single-entry driver-mirror check: `python tools/drive_one.py name [name2 ...]`.

Same type-sensitive comparator as tools/full_drive.py, but only for the
named registry entries — the fast loop while building a new operator.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tools.full_drive import _norm


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    for name in names:
        if name not in qs:
            bad.append((name, "MISSING from queries()"))
            continue
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, "SPARK ERR", str(exc)[:400]))
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows) — no oracle")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, "DUCK ERR", str(exc)[:400]))
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            bad.append((name, "schema", scols, ocols))
            continue
        s = sorted(
            (tuple(_norm(v) for v in r) for r in sdf[scols].itertuples(index=False)),
            key=repr,
        )
        o = sorted(
            (tuple(_norm(v) for v in r) for r in odf[ocols].itertuples(index=False)),
            key=repr,
        )
        if s != o:
            diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
            bad.append((name, "values", len(s), len(o), diff))
            continue
        print(f"{name}: OK ({len(s)} rows)")
    for b in bad:
        print("BAD:", b)
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
