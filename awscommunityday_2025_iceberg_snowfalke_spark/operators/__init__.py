"""Operator corpus.

Each submodule exposes:
    QUERIES: dict[str, Callable[(SparkSession, sf_dir), DataFrame]]
    ORACLE:  dict[str, str]   # duckdb-runnable ANSI SQL twins (subset)

``all_queries()`` / ``all_oracle()`` merge every submodule for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import (
        analytics,
        dedup,
        lifecycle,
        multimodal,
        pipeline,
        relational,
        similarity,
        snowsql,
        temporal,
        textstats,
        tpch,
    )
    from ..sources import pyds, writers
    from ..streaming import jobs as streaming_jobs
    from .. import governance, mv, plans, scale

    return (
        relational,
        snowsql,
        tpch,
        analytics,
        pipeline,
        temporal,
        dedup,
        similarity,
        textstats,
        multimodal,
        lifecycle,
        governance,
        streaming_jobs,
        writers,
        pyds,
        mv,
        scale,
        plans,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(getattr(mod, "QUERIES", {}))
    return merged


def all_oracle() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(getattr(mod, "ORACLE", {}))
    return merged
