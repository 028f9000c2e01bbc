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


# --- pseudonymization audit (G2 extension) -----------------------------------
_TOKEN = (
    "cast(conv(substr(md5(concat('pseud-', cast({c} as string))), 1, 15), "
    "16, 10) as bigint)"
)
_DUCK_TOKEN = (
    "CAST(concat('0x', substr(md5(concat('pseud-', CAST({c} AS VARCHAR))), "
    "1, 15)) AS BIGINT)"
)


def pseudonymized_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joinability-preserving pseudonymization audit — the table a privacy
    review asks for before a de-identified extract ships: replace user_id
    with a deterministic keyed token (md5-based; same construction as the
    corpus sampling hash, salted with a purpose prefix), then PROVE the
    extract still joins: per region, the event count through the
    pseudonymized join must equal the plain join, and the distinct-token
    count must equal the distinct-user count (no collisions). Tokens are
    codegen'd md5 on both join sides — no lookup table to secure, no
    extra shuffle beyond the joins being audited; the profile side
    broadcasts like every other dim join here."""
    from .sources.registry import load

    prof = user_profiles(spark, sf_dir).select(
        "user_id", "region", F.expr(_TOKEN.format(c="user_id")).alias("tok")
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr(_TOKEN.format(c="user_id")).alias("tok")
    )
    plain = (
        ev.join(F.broadcast(prof.select("user_id", "region")), "user_id")
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n_events_plain"))
    )
    pseudo = (
        ev.select("tok")
        .join(F.broadcast(prof.select("tok", "region")), "tok")
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n_events_pseudo"))
    )
    users = prof.groupBy("region").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("tok").alias("n_tokens"),
    )
    return (
        users.join(plain, "region", "left")
        .join(pseudo, "region", "left")
        .select(
            "region",
            "n_users",
            "n_tokens",
            F.coalesce("n_events_plain", F.lit(0)).alias("n_events_plain"),
            F.coalesce("n_events_pseudo", F.lit(0)).alias("n_events_pseudo"),
        )
    )


QUERIES = {
    "masked_profiles": masked_profiles,
    "masked_profiles_admin": masked_profiles_admin,
    "pseudonymized_join_audit": pseudonymized_join_audit,
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
    "pseudonymized_join_audit": f"""
        WITH prof AS (
            SELECT user_id, region,
                   {_DUCK_TOKEN.format(c="user_id")} AS tok
            FROM {PROFILES_SQL} p
        ),
        ev AS (
            SELECT user_id, {_DUCK_TOKEN.format(c="user_id")} AS tok
            FROM events
        ),
        plain AS (
            SELECT p.region, COUNT(*) AS n_events_plain
            FROM ev e JOIN prof p ON e.user_id = p.user_id GROUP BY p.region
        ),
        pseudo AS (
            SELECT p.region, COUNT(*) AS n_events_pseudo
            FROM ev e JOIN prof p ON e.tok = p.tok GROUP BY p.region
        ),
        users AS (
            SELECT region, COUNT(DISTINCT user_id) AS n_users,
                   COUNT(DISTINCT tok) AS n_tokens
            FROM prof GROUP BY region
        )
        SELECT u.region, u.n_users, u.n_tokens,
               COALESCE(pl.n_events_plain, 0) AS n_events_plain,
               COALESCE(ps.n_events_pseudo, 0) AS n_events_pseudo
        FROM users u
        LEFT JOIN plain pl ON u.region = pl.region
        LEFT JOIN pseudo ps ON u.region = ps.region
    """,
}
