#!/usr/bin/env python
"""Single-entry driver-mirror check: `python tools/drive_one.py name1 name2 ...`
Same type-sensitive comparator as full_drive.py, filtered to the named
entries (substring match allowed with a trailing '*')."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tools.full_drive import _norm


def main() -> None:
    names = sys.argv[1:]
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
    def _matches(n: str, p: str) -> bool:
        return n == p or (p.endswith("*") and n.startswith(p[:-1]))

    picked = [n for n in sorted(qs) if any(_matches(n, p) for p in names)]
    unmatched = [p for p in names if not any(_matches(n, p) for n in qs)]
    if not picked:
        raise SystemExit(f"no entries match {names}")
    bad = []
    for p in unmatched:
        # a typo'd name must NOT look like a green run
        bad.append((p, "no-such-entry"))
        print(f"{p}: NO ENTRY MATCHES")
    for name in picked:
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as exc:  # keep driving the remaining names
            bad.append((name, "error"))
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            bad.append((name, "oracle-error"))
            print(f"{name}: ORACLE ERROR {type(exc).__name__}: {exc}")
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            bad.append((name, "schema", scols, ocols))
            print(f"{name}: SCHEMA MISMATCH {scols} vs {ocols}")
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
            bad.append((name, "values"))
            print(f"{name}: VALUE MISMATCH rows {len(s)} vs {len(o)}")
            for a, b in diff:
                print("  spark :", a)
                print("  oracle:", b)
            continue
        print(f"{name}: OK ({len(s)} rows)")
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
