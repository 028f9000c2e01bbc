"""Correctness of the relational corpus vs the duckdb oracle — the same
check the driver runs (row count + schema + order-insensitive values)."""

import pytest

from awscommunityday_2025_iceberg_snowfalke_spark.operators import relational

from conftest import SF_DIR, assert_matches_oracle

ORACLE_BACKED = sorted(set(relational.QUERIES) & set(relational.ORACLE))


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_relational_query_matches_oracle(spark, oracle, name):
    df = relational.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, relational.ORACLE[name], name)


def test_every_query_has_oracle_or_reason():
    missing = set(relational.QUERIES) - set(relational.ORACLE)
    assert not missing, f"relational queries without oracle SQL: {missing}"
