#!/usr/bin/env python
"""Full-registry driver-mirror certification.

Runs EVERY `queries()` entry against its `oracle_sql()` twin at sf0.01
from a vanilla SparkSession (no tuned session factory — catches reliance
on repo-session conf), comparing with TYPE-SENSITIVE normalization: ints
and floats hash differently even when ==-equal (`49` vs `49.0`), exactly
like an external value hash. This is the comparator semantics that the
equality-based pytest gate is blind to — the round-7 driver-red class
(uncast DuckDB SUM → HUGEINT → float64) is only visible here or at the
external driver itself.

Usage: python tools/full_drive.py  [SPARK_GRAFT_SF_DIR to override]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return ("f", round(v, 6))
    if isinstance(v, bool):
        return ("b", v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1:
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    dt = str(getattr(v, "dtype", ""))
    if dt == "bool":
        return ("b", bool(v))
    if dt.startswith(("int", "uint")) or isinstance(v, int):
        return ("i", int(v))
    return v


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    bad, n_ok = [], 0
    for name in sorted(oracles):
        try:
            sdf = qs[name](spark, sf).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001 — report and continue
            bad.append((name, "ERR", str(exc)[:150]))
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
            diff = [(a, b) for a, b in zip(s, o) if a != b][:2]
            bad.append((name, "values", len(s), len(o), diff))
            continue
        n_ok += 1
    print(f"OK: {n_ok} of {len(oracles)}")
    for b in bad:
        print("BAD:", b)
    if bad:
        raise SystemExit(1)
    print("FULL DRIVE PASS (type-sensitive)")


if __name__ == "__main__":
    main()
