"""Skew-mitigation utilities (the 100 TB toolbox).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. ``salted_join`` is the explicit
fallback for the pathological case AQE can't fix: a shuffle join where one
side has a handful of keys carrying most of the rows (a celebrity user, an
empty-string key). The hot side gets a random salt in [0, n_salts); the
other side is replicated once per salt; joining on (key, salt) spreads each
hot key over ``n_salts`` reducers.

Cost model: replicating the small side ×n_salts vs. one reducer processing
an entire hot key alone. Worth it when max-key-share × rows ≫ rows/salts.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["salted_join", "write_bucketed", "bucketed_user_join"]

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with the skewed side
    salted and the other side replicated per salt. Result equals
    ``skewed.join(other, on, how)`` (column order included); only the
    physical distribution changes. Supported ``how``: inner / left
    (semantics where replication can't duplicate or drop preserved rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    salted = skewed.withColumn(
        _SALT, (F.rand(seed=0) * n_salts).cast("int") % n_salts
    )
    replicated = other.withColumn(_SALT, F.explode(salts))
    out = salted.join(replicated, [on, _SALT], how)
    return out.drop(_SALT)


# --- bucketing: the co-located-join story ------------------------------------
N_BUCKETS = 8


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = N_BUCKETS
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``. Two tables
    bucketed the same way join with ZERO exchange and zero sort — the
    shuffle is paid once at write time, then amortized over every
    subsequent join/aggregation on the key. At 100 TB this converts the
    recurring fact⋈fact shuffle (the single largest cost in the plan) into
    a local merge per bucket."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate query: events and the profile dim both bucketed by
    user_id, then joined and aggregated — the join runs bucket-local
    (no Exchange before SortMergeJoin; asserted in tests/test_plans.py).
    Results are identical to the unbucketed plan; only distribution
    changes."""
    from .sources.registry import load, user_profiles

    # isolated warehouse per sf_dir so concurrent sessions don't collide
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ev_tbl, prof_tbl = f"b_events_{tag}", f"b_profiles_{tag}"
    if not (
        spark.catalog.tableExists(ev_tbl) and spark.catalog.tableExists(prof_tbl)
    ):
        # the in-memory catalog is per-session but managed-table locations
        # persist on disk — clear stale directories left by prior sessions
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for tbl in (ev_tbl, prof_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
        ev = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
        prof = user_profiles(spark, sf_dir).select("user_id", "region")
        write_bucketed(ev, ev_tbl, "user_id")
        write_bucketed(prof, prof_tbl, "user_id")
    joined = spark.table(ev_tbl).join(spark.table(prof_tbl), "user_id")
    return (
        joined.groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("region")
    )


QUERIES = {"bucketed_user_join": bucketed_user_join}

ORACLE = {
    "bucketed_user_join": """
        SELECT region, COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM (SELECT user_id, event_type, value FROM events) e
        JOIN (SELECT c_custkey AS user_id, r_name AS region
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey) p
          ON e.user_id = p.user_id
        GROUP BY region
    """,
}
