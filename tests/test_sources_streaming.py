"""Sources/sinks (S1-S3, S7) and streaming ingest (S11) library behavior."""

import os

from pyspark.sql import functions as F

from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import (
    CUTOFF_7D,
    events_with_props,
    load,
    register_views,
)
from awscommunityday_2025_iceberg_snowfalke_spark.sources.writers import (
    ctas_hot_tier,
    read_csv,
    write_csv,
    write_partitioned,
)
from awscommunityday_2025_iceberg_snowfalke_spark.streaming import (
    ingest_file_stream,
    simulate_small_file_landing,
)
from awscommunityday_2025_iceberg_snowfalke_spark import governance

from conftest import SF_DIR


def test_partitioned_layout(spark, tmp_path):
    ev = load(spark, SF_DIR, "events")
    path = str(tmp_path / "part")
    write_partitioned(ev, path, granularity="day")
    dirs = os.listdir(path)
    assert any(d.startswith("year=") for d in dirs)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # partition pruning: day filter must prune input files
    pruned = back.filter((F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 5))
    assert pruned.count() == ev.filter(F.to_date("ts") == "2024-01-05").count()


def test_csv_roundtrip(spark, tmp_path):
    prof = load(spark, SF_DIR, "customer").select("c_custkey", "c_name", "c_acctbal")
    path = str(tmp_path / "csv")
    write_csv(prof, path)
    back = read_csv(spark, path)
    assert back.count() == prof.count()
    assert dict(back.dtypes)["c_custkey"] in ("int", "bigint")  # inferred


def test_ctas_hot_tier(spark, tmp_path):
    ev = load(spark, SF_DIR, "events")
    hot = ctas_hot_tier(ev, str(tmp_path / "hot"), CUTOFF_7D)
    assert hot.count() == ev.filter(F.col("ts") >= CUTOFF_7D).count()


def test_register_views_sql_entry(spark):
    register_views(spark, SF_DIR, "events", "customer")
    n = spark.sql("SELECT COUNT(*) AS c FROM events").collect()[0].c
    assert n == load(spark, SF_DIR, "events").count()


def test_events_with_props_map(spark):
    df = events_with_props(spark, SF_DIR)
    row = df.filter(F.col("props_map").getItem("k").isNotNull()).first()
    assert row is not None
    assert row.props_map["k"] == str(
        __import__("json").loads(row.props)["k"]
    )


def test_streaming_ingest_small_files(spark, tmp_path):
    ev = load(spark, SF_DIR, "events").limit(500)
    landing = str(tmp_path / "landing")
    # reproduce the small-file pathology, then ingest with checkpointing
    simulate_small_file_landing(ev, landing, n_files=12)
    target, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    schema = spark.read.parquet(landing).schema
    ingest_file_stream(spark, landing, target, ckpt, schema)
    out = spark.read.parquet(target)
    assert out.count() == 500
    assert "event_date" in out.columns
    # idempotent re-run: checkpoint remembers processed files
    ingest_file_stream(spark, landing, target, ckpt, schema)
    assert spark.read.parquet(target).count() == 500


def test_governance_masking_and_rls(spark):
    masked = governance.secured_profiles(spark, SF_DIR, role="analyst")
    rows = masked.limit(5).collect()
    assert all(r.name == governance.MASK for r in rows)
    assert {r.region for r in masked.collect()} == {"ASIA"}
    admin = governance.secured_profiles(spark, SF_DIR, role="ADMIN")
    assert all(r.name != governance.MASK for r in admin.limit(5).collect())


def test_multimodal_stub_raises(spark):
    from awscommunityday_2025_iceberg_snowfalke_spark.operators import multimodal

    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")
    meta = multimodal.fake_decode_meta(b"x" * 600)
    assert meta == {"payload_len": 600, "n_frames": 3, "fmt": "txtimg"}


def test_generator_events_schema_and_domains(spark):
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.generator import (
        EVENT_TYPES,
        REGIONS,
        generate_user_events,
        generate_user_profiles,
    )

    ev = generate_user_events(spark, 2000, partitions=8)
    assert ev.columns == ["user_id", "event_type", "timestamp", "properties", "region"]
    assert ev.count() == 2000
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert types <= set(EVENT_TYPES) and len(types) >= 8
    regions = {r[0] for r in ev.select("region").distinct().collect()}
    assert regions <= set(REGIONS)
    # properties duality: JSON string on disk, map-decodable (X10)
    from pyspark.sql import functions as F

    decoded = ev.select(F.from_json("properties", "map<string,string>").alias("m"))
    assert decoded.filter(F.col("m").getItem("session_id").isNull()).count() == 0
    purchases = ev.filter("event_type = 'purchase'").select(
        F.get_json_object("properties", "$.amount").alias("amount")
    )
    assert purchases.filter(F.col("amount").isNull()).count() == 0

    # deterministic: same args → identical dataset at any parallelism
    again = generate_user_events(spark, 2000, partitions=3)
    assert ev.exceptAll(again).count() == 0

    prof = generate_user_profiles(spark, 500)
    assert prof.count() == 500
    assert prof.columns == ["user_id", "name", "email", "region", "created_at"]


def test_pyds_snapshot_source_roundtrip_and_time_travel(spark, tmp_path):
    """format("snapshot") must read exactly what SnapshotTable holds, and
    option("version") must time-travel."""
    from pyspark.sql import functions as F

    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources import pyds
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(ev.filter(F.col("event_id") % 2 == 0), n_files=2)
    t.append(ev.filter(F.col("event_id") % 2 == 1), n_files=2)

    pyds.register(spark)
    cur = spark.read.format("snapshot").option("path", t.path).load()
    assert cur.count() == ev.count()
    assert set(cur.columns) == {"event_id", "user_id", "value"}
    v1 = (
        spark.read.format("snapshot")
        .option("path", t.path)
        .option("version", 1)
        .load()
    )
    assert v1.count() == ev.filter(F.col("event_id") % 2 == 0).count()


def test_pyds_pushdown_prunes_files(spark, tmp_path):
    """pushFilters must drop files whose footer [min,max] cannot match,
    and never drop files for unsupported filter shapes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import (
        GreaterThanOrEqual,
        LessThanOrEqual,
        StringContains,
    )

    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.pyds import (
        SnapshotReader,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "event_type")
    t = SnapshotTable(spark, str(tmp_path / "t"))
    chunked = ev.withColumn(
        "_c", F.ntile(4).over(Window.orderBy("user_id", "event_id"))
    )
    for c in (1, 2, 3, 4):
        t.append(chunked.filter(F.col("_c") == c).drop("_c"), n_files=1)

    lo_hi = ev.agg(F.min("user_id"), F.max("user_id")).collect()[0]
    umin, umax = int(lo_hi[0]), int(lo_hi[1])
    mid = (umin + umax) // 2

    r = SnapshotReader({"path": t.path})
    assert len(r.partitions()) == 4
    unhandled = r.pushFilters(
        [GreaterThanOrEqual(("user_id",), mid), LessThanOrEqual(("user_id",), mid)]
    )
    assert len(list(unhandled)) == 2  # source never claims filter ownership
    assert 1 <= len(r.partitions()) <= 2  # point-ish lookup hits 1-2 of 4 files

    # unsupported shapes must not prune
    r2 = SnapshotReader({"path": t.path})
    r2.pushFilters([StringContains(("event_type",), "click")])
    assert len(r2.partitions()) == 4


def test_pyds_stream_reads_commits_incrementally(spark, tmp_path):
    """readStream over format("snapshot"): first availableNow run drains
    all append commits; after one more append, a restarted run with the
    same checkpoint processes ONLY the new commit (exactly-once). File
    sink + shared checkpoint (the memory sink cannot recover)."""
    from pyspark.sql import functions as F

    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources import pyds
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(ev.filter(F.col("event_id") % 3 == 0), n_files=2)
    t.append(ev.filter(F.col("event_id") % 3 == 1), n_files=2)

    pyds.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("snapshot")
            .option("path", t.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    n1 = ev.filter(F.col("event_id") % 3 != 2).count()
    assert drain().count() == n1

    t.compact(target_files=1)  # non-append commit: must NOT replay rows
    t.append(ev.filter(F.col("event_id") % 3 == 2), n_files=1)
    # second run appends ONLY the new commit's rows to the sink
    assert drain().count() == ev.count()


def test_pyds_write_append_roundtrip(spark, tmp_path):
    """df.write.format("snapshot"): two appends commit as two snapshot
    versions readable by both the format reader and SnapshotTable, with
    time travel intact."""
    from pyspark.sql import functions as F

    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources import pyds
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load

    pyds.register(spark)
    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "t")

    half = ev.filter(F.col("event_id") % 2 == 0)
    half.write.format("snapshot").option("path", path).mode("append").save()
    rest = ev.filter(F.col("event_id") % 2 == 1)
    rest.write.format("snapshot").option("path", path).mode("append").save()

    back = spark.read.format("snapshot").option("path", path).load()
    assert back.count() == ev.count()
    v1 = (
        spark.read.format("snapshot").option("path", path).option("version", 1).load()
    )
    assert v1.count() == half.count()

    t = SnapshotTable(spark, path)
    assert [m["operation"] for m in t.history()] == ["append", "append"]
    assert t.read().count() == ev.count()

    # overwrite drops previous files from the new snapshot
    half.write.format("snapshot").option("path", path).mode("overwrite").save()
    assert (
        spark.read.format("snapshot").option("path", path).load().count()
        == half.count()
    )


def test_load_normalizes_events_ts_repr(spark, tmp_path):
    """The driver has regenerated events.parquet with three different ts
    physical types across rounds (TIMESTAMP(NANOS) -> long shim;
    timestamp[us] UTC-adjusted -> LTZ; timestamp[us] naive -> NTZ). The
    load choke point must hand every downstream operator a plain
    TIMESTAMP (LTZ) column with identical UTC instants regardless of
    which representation the parquet carries."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from awscommunityday_2025_iceberg_snowfalke_spark.sources import registry

    base = dt.datetime(2024, 1, 5, 12, 30, 0)
    rows = [base + dt.timedelta(hours=i) for i in range(4)]
    variants = {
        "ntz": pa.timestamp("us"),
        "ltz": pa.timestamp("us", tz="UTC"),
        "nanos": pa.timestamp("ns"),
    }
    got = {}
    for name, ts_type in variants.items():
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(rows, pa.timestamp("us")).cast(ts_type),
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(["a", "b", "a", "b"]),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
                "props": pa.array(["{}"] * 4),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        df = registry.load(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got[name] = sorted(r["ts"] for r in df.select("ts").collect())
    assert got["ntz"] == got["ltz"] == got["nanos"]


def test_pyds_bloom_pushdown_plan_level(spark, tmp_path):
    """Bloom-sidecar pruning inside pushFilters: on a scrambled layout
    where footer min/max keeps every file, an EqualTo on the indexed
    column plans ~1 split, an absent key plans 0, a column without a
    sidecar (or a pre-sidecar table) falls back to footer behavior, and
    the hash constants are pinned to the lifecycle layer's."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo

    from awscommunityday_2025_iceberg_snowfalke_spark.operators import (
        lifecycle as L,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
        _write_chunked,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources import pyds
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.pyds import (
        SnapshotReader,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load

    assert (pyds._BLOOM_M, pyds._BLOOM_P, pyds._BLOOM_A, pyds._BLOOM_B) == (
        L.BLOOM_M,
        L.BLOOM_P,
        L.BLOOM_A,
        L.BLOOM_B,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    t = SnapshotTable(spark, str(tmp_path / "b"))
    _write_chunked(
        t,
        docs.withColumn("_c", (F.col("doc_id") * F.lit(2654435761)) % F.lit(8)),
    )
    mx = int(docs.agg(F.max("doc_id")).collect()[0][0])
    probe = mx // 3

    # pre-sidecar: footer stats keep all 8 files (scrambled layout)
    r0 = SnapshotReader({"path": t.path})
    r0.pushFilters([EqualTo(("doc_id",), probe)])
    assert len(r0.partitions()) == 8

    t.build_bloom_index("doc_id")
    r1 = SnapshotReader({"path": t.path})
    r1.pushFilters([EqualTo(("doc_id",), probe)])
    assert len(r1.partitions()) == 1  # fp-free at this density

    r2 = SnapshotReader({"path": t.path})
    r2.pushFilters([EqualTo(("doc_id",), mx + 999_983)])
    assert len(r2.partitions()) == 0  # absent key: nothing to read

    # un-indexed column: the bloom stage is a no-op — an in-bounds value
    # must keep every file (only footer fallback applies)
    r4 = SnapshotReader({"path": t.path})
    mid_chars = int(
        docs.agg(F.expr("percentile_approx(n_chars, 0.5)")).collect()[0][0]
    )
    r4.pushFilters([EqualTo(("n_chars",), mid_chars)])
    assert len(r4.partitions()) == 8


def test_pyds_tag_read(spark, tmp_path):
    """`option("tag", name)` resolves the immutable named ref through the
    source API (Iceberg's VERSION AS OF 'tag'): reads pin to the tagged
    snapshot across later appends; unknown tags fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
    )
    from awscommunityday_2025_iceberg_snowfalke_spark.sources import pyds
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.registry import load

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id")
    t = SnapshotTable(spark, str(tmp_path / "tg"))
    half = ev.filter(F.col("event_id") % 2 == 0)
    t.append(half, n_files=2)
    t.create_tag("training_v1")
    t.append(ev.filter(F.col("event_id") % 2 == 1), n_files=2)

    pyds.register(spark)
    tagged = (
        spark.read.format(pyds.FORMAT_NAME)
        .option("path", t.path)
        .option("tag", "training_v1")
        .load()
    )
    assert tagged.count() == half.count()
    latest = (
        spark.read.format(pyds.FORMAT_NAME).option("path", t.path).load()
    )
    assert latest.count() == ev.count()
    with pytest.raises(Exception, match="unknown tag"):
        (
            spark.read.format(pyds.FORMAT_NAME)
            .option("path", t.path)
            .option("tag", "nope")
            .load()
            .count()
        )


def test_merge_full_accounting_and_state(spark, tmp_path):
    """merge_full leaves the table exactly equal to the source and the
    accounting identities hold: rows_after = updated + inserted,
    rows_before = updated + deleted."""
    from pyspark.sql import functions as F

    from awscommunityday_2025_iceberg_snowfalke_spark.operators.lifecycle import (
        SnapshotTable,
    )

    events = load(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    t = SnapshotTable(spark, str(tmp_path / "mf"))
    target = events.filter(F.col("event_id") % 3 != 0)
    source = events.filter(F.col("event_id") % 2 == 0)
    t.append(target, n_files=2)
    acct = t.merge_full(source, ["event_id"], n_files=2)
    assert acct["rows_after"] == acct["updated"] + acct["inserted"]
    assert acct["rows_before"] == acct["updated"] + acct["deleted"]
    assert t.read().count() == source.count()
    # table state IS the source (exceptAll both ways is empty)
    assert t.read().exceptAll(source).count() == 0
    assert source.exceptAll(t.read()).count() == 0
    assert t.history()[-1]["operation"] == "merge.full"


def test_jsonl_roundtrip_preserves_adversarial_text(spark, tmp_path):
    """The injected escape-adversarial rows must survive the JSONL write
    → explicit-schema read BYTE-EXACTLY (newline, tab, quote, backslash,
    non-BMP unicode) — the fidelity claim behind the aggregate entry."""
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.writers import (
        JSONL_ADVERSARIAL,
    )

    adv = spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in JSONL_ADVERSARIAL],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "jsonl")
    adv.write.mode("overwrite").json(path)
    back = {
        r["doc_id"]: r["text"]
        for r in spark.read.schema(adv.schema).json(path).collect()
    }
    assert back == {i: t for i, t, _, _ in JSONL_ADVERSARIAL}


def test_avro_roundtrip_matches_orc(spark):
    """The Avro roundtrip: the format resolver finds a usable provider
    (this distribution bundles the classes in spark-sql but does not
    ServiceLoader-register the short name — the resolver falls back to
    the fully-qualified provider), and the roundtrip's fidelity
    aggregate equals the ORC twin's over the same events — any
    Avro-encoder type mangle (timestamp precision, double bits, string
    encoding) splits the two."""
    from awscommunityday_2025_iceberg_snowfalke_spark.sources.writers import (
        avro_format,
        avro_roundtrip_events,
        orc_roundtrip_events,
    )

    assert avro_format(spark) is not None
    got = {tuple(r) for r in avro_roundtrip_events(spark, SF_DIR).collect()}
    want = {tuple(r) for r in orc_roundtrip_events(spark, SF_DIR).collect()}
    assert got == want
