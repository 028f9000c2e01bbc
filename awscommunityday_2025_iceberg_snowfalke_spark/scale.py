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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

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
