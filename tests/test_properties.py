"""Property-based tests (hypothesis): the invariants the engine leans on.

- det_sum/det_avg must be partition-order independent (the whole point of
  the decimal shim) — checked against a Python-side exact computation for
  arbitrary float lists and arbitrary repartitionings.
- dialect.translate must preserve QUALIFY semantics structurally for the
  clause shapes in the reference corpus.
"""

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from awscommunityday_2025_iceberg_snowfalke_spark.dialect import translate

_floats = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=50,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=_floats, n_parts=st.integers(min_value=1, max_value=7))
def test_det_sum_partition_invariant(spark, values, n_parts):
    from awscommunityday_2025_iceberg_snowfalke_spark.functions import det_sum

    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(
        n_parts
    )
    got = df.agg(det_sum("x", 4).alias("s")).collect()[0]["s"]
    # Spark casts each double to DECIMAL(28,8) (half-up at 8 dp) then sums
    expect = float(
        round(
            sum(
                Decimal(repr(v)).quantize(Decimal("1.00000000"), rounding=ROUND_HALF_UP)
                for v in values
            ),
            4,
        )
    )
    assert got == pytest.approx(expect, abs=1e-9)


_ident = st.text(alphabet="abcdefg", min_size=1, max_size=6)


@settings(max_examples=50, deadline=None)
@given(
    rank_alias=_ident,
    k=st.integers(min_value=1, max_value=99),
    tail=st.sampled_from(["", "ORDER BY x", "LIMIT 7", "ORDER BY x LIMIT 7"]),
)
def test_translate_qualify_structure(rank_alias, k, tail):
    sql = (
        f"SELECT x, ROW_NUMBER() OVER (PARTITION BY y ORDER BY z) AS {rank_alias} "
        f"FROM t QUALIFY {rank_alias} <= {k} {tail}"
    )
    out = translate(sql)
    assert "QUALIFY" not in out.upper()
    assert out.startswith("SELECT * FROM (")
    assert f"WHERE {rank_alias} <= {k}" in out
    assert tail.strip() in out  # ORDER BY / LIMIT survive outside the subquery
    assert "ROW_NUMBER() OVER (PARTITION BY y ORDER BY z)" in out


def test_translate_leaves_plain_sql_alone():
    sql = "SELECT a FROM t WHERE b > 1 ORDER BY a"
    assert translate(sql) == sql
