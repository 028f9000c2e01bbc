"""Governance operators (SURVEY §2.11, G1-G2).

The reference defines a row-access policy (region = CURRENT_USER_REGION(),
P:769-775) and a column-masking policy (role-gated CASE → '***MASKED***',
P:778-781). OSS Spark has no native RLS/masking, so both become *secured
views*: plain filter + CASE expressions layered over the base table — which
is exactly how Catalyst would enforce them anyway (the predicate pushes into
the scan, so RLS is free partition/file pruning when the policy column is
the partition key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.registry import PROFILES_SQL, user_profiles

PRIVILEGED_ROLES = ("ADMIN", "PII_READER")
MASK = "***MASKED***"


def masked_view(profiles: DataFrame, role: str) -> DataFrame:
    """G2: column masking — PII columns visible only to privileged roles."""
    authorized = role in PRIVILEGED_ROLES
    name = F.col("name") if authorized else F.lit(MASK)
    return profiles.select(
        "user_id",
        name.alias("name"),
        "region",
        "segment",
    )


def row_access_view(profiles: DataFrame, user_region: str) -> DataFrame:
    """G1: row access policy — only rows in the caller's region."""
    return profiles.filter(F.col("region") == user_region)


def secured_profiles(
    spark: SparkSession, sf_dir: str, role: str = "analyst", user_region: str = "ASIA"
) -> DataFrame:
    prof = user_profiles(spark, sf_dir)
    return masked_view(row_access_view(prof, user_region), role)


# --- driver-contract queries (deterministic role/region) --------------------
def masked_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return secured_profiles(spark, sf_dir, role="analyst", user_region="ASIA")


def masked_profiles_admin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return secured_profiles(spark, sf_dir, role="ADMIN", user_region="ASIA")


QUERIES = {
    "masked_profiles": masked_profiles,
    "masked_profiles_admin": masked_profiles_admin,
}

ORACLE = {
    "masked_profiles": f"""
        SELECT user_id, '{MASK}' AS name, region, segment
        FROM {PROFILES_SQL} pr WHERE region = 'ASIA'
    """,
    "masked_profiles_admin": f"""
        SELECT user_id, name, region, segment
        FROM {PROFILES_SQL} pr WHERE region = 'ASIA'
    """,
}
