"""Smoke checks of the driver contract surface."""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {
        "region",
        "total_events",
        "unique_users",
        "purchase_rate",
    }


def test_queries_and_oracle_align(spark):
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # as of round 5 EVERY registry entry is oracle-backed (zero rows-only);
    # keep it that way — a new operator ships with its DuckDB twin, or this
    # assertion is consciously relaxed with a justification
    assert set(osql) == set(qs), set(osql) ^ set(qs)


def test_all_queries_return_dataframes(spark):
    qs = entry_mod.queries()
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, f"{name} returned no columns"


def test_all_queries_emit_canonicalizable_schemas(spark):
    """Driver-harness contract: the gate canonicalizes results with pandas
    (sort_values + hash over cells), which dies on list/dict cells — the
    r5 multimodal ERROR class. Every registry entry must therefore emit
    only atomic column types; vector/map/struct outputs are serialized to
    canonical text (see multimodal._vec_text, events_object_agg) and the
    raw form lives in a non-registry ``*_vectors`` variant."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in entry_mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, field.name, str(field.dataType)))
    assert not offenders, offenders
