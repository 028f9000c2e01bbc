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


def test_bench_settle_start_branches():
    """The bench's quiet-host gate (r16-verdict item 2): an idle start
    with stable calibration returns with no contended record; a
    contended start (now gated at load_1m ≤ 1) waits until the injected
    loadavg drops, then re-measures and preserves every raw sample; an
    unstable first calibration (fresh-process warmup) is re-sampled
    until two consecutive samples agree within 10%."""
    import bench

    # idle + stable calibration: no record; settled calibration = the
    # second (confirming) sample
    cals = iter([0.40, 0.41])
    ld, cal, rec, samples = bench._settle_start(
        load_fn=lambda: 0.5,
        calib_fn=lambda: next(cals),
        sleep_fn=lambda s: None,
    )
    assert (ld, cal, rec, samples) == (0.5, 0.41, None, [0.40, 0.41])

    # contended then draining: raw start preserved, settled re-measure
    seq = iter([9.9, 9.1, 7.2, 0.9, 0.7])  # start, 3 polls, re-measure
    cals = iter([0.42, 0.41])
    ld, cal, rec, samples = bench._settle_start(
        load_fn=lambda: next(seq),
        calib_fn=lambda: next(cals),
        sleep_fn=lambda s: None,
    )
    assert ld == 0.7 and cal == 0.41
    assert rec["load_1m_raw"] == 9.9
    assert rec["calibration_sec_raw"] == 0.42
    assert rec["settle_wait_sec"] >= 0.0

    # load 2.0 is contended under the r17 gate (old threshold was 6)
    seq = iter([2.0, 0.8, 0.6])
    cals = iter([0.40, 0.41])
    ld, cal, rec, samples = bench._settle_start(
        load_fn=lambda: next(seq),
        calib_fn=lambda: next(cals),
        sleep_fn=lambda s: None,
    )
    assert ld == 0.6 and rec["load_1m_raw"] == 2.0

    # cold-start calibration drift on an IDLE box: first sample ~2x
    # slow, re-sampled until consecutive agreement; the run must NOT be
    # labeled contended (rec None) — the samples are the audit trail
    cals = iter([1.39, 0.80, 0.69, 0.68])
    ld, cal, rec, samples = bench._settle_start(
        load_fn=lambda: 0.3,
        calib_fn=lambda: next(cals),
        sleep_fn=lambda s: None,
    )
    assert cal == 0.68 and rec is None
    assert samples == [1.39, 0.80, 0.69, 0.68]

    # end-of-suite decay wait: raw sample preserved, settled sample
    # taken once the injected load drops under the gate
    seq = iter([24.0, 9.0, 3.0, 0.9])
    raw, settled = bench._settle_end(
        load_fn=lambda: next(seq), sleep_fn=lambda s: None
    )
    assert raw == 24.0 and settled == 0.9
