"""Corpus-wide correctness: every oracle-backed query in the merged
registry vs duckdb — the same gate the driver runs at sf0.01."""

import pytest

from awscommunityday_2025_iceberg_snowfalke_spark.operators import (
    all_oracle,
    all_queries,
)

from conftest import SF_DIR, assert_matches_oracle

_QUERIES = all_queries()
_ORACLE = all_oracle()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_query_matches_oracle(spark, oracle, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, _ORACLE[name], name)


def test_oracle_keys_subset_of_queries():
    assert set(_ORACLE) <= set(_QUERIES), set(_ORACLE) - set(_QUERIES)
