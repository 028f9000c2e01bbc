"""Snowflake-dialect SQL shim (SURVEY §7 risk register: dialect deltas).

The reference's query corpus is Snowflake SQL. Spark SQL accepts most of it
verbatim (``DATE(ts)``, ``CURRENT_DATE - 7``, ``INTERVAL '1 DAY'`` all
parse), with one structural gap: the ``QUALIFY`` clause
(performance_comparison.sql:172, run_performance_tests.py:208). OSS Spark
has no QUALIFY, so :func:`translate` rewrites it into the standard
wrap-and-filter form::

    SELECT ..., ROW_NUMBER() OVER (...) AS r FROM t QUALIFY r <= 5 ORDER BY x
    →
    SELECT * FROM ( SELECT ..., ROW_NUMBER() OVER (...) AS r FROM t ) WHERE r <= 5 ORDER BY x

which Catalyst plans identically to the hand-written rank-then-filter
(one Window exchange, then a Filter) — verified by the oracle-checked
``top5_per_user_sql`` twin of the DataFrame version.

The rewrite is a clause-splitter, not a SQL parser: it handles QUALIFY at
the top level of a (sub)query followed by optional ORDER BY / LIMIT —
exactly the shapes in the reference corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Determinism anchor for CURRENT_DATE-relative reference SQL (SURVEY §5):
# the driver's events table spans 2024-01-01..2024-01-30, so "today" is
# pinned to the day after the window — CURRENT_DATE - 7 lands on the same
# 2024-01-24 cutoff the DataFrame corpus uses (sources.registry.CUTOFF_7D).
ANCHOR_DATE = "2024-01-31"

_QUALIFY_RE = re.compile(
    r"^(?P<body>.*?)\bQUALIFY\b(?P<pred>.*?)"
    r"(?P<tail>\bORDER\s+BY\b.*|\bLIMIT\b.*|$)",
    re.IGNORECASE | re.DOTALL,
)

# CURRENT_DATE / CURRENT_DATE() — word-bounded so column names survive
_CURRENT_DATE_RE = re.compile(r"\bCURRENT_DATE\b(?:\s*\(\s*\))?", re.IGNORECASE)
# CURRENT_TIMESTAMP / CURRENT_TIMESTAMP() — the reference's perf harness
# brackets every test with `SELECT CURRENT_TIMESTAMP() AS start_time`
# (performance_comparison.sql:53-60); anchored for the same determinism
# reason as CURRENT_DATE
_CURRENT_TS_RE = re.compile(
    r"\bCURRENT_TIMESTAMP\b(?:\s*\(\s*\))?", re.IGNORECASE
)
# OBJECT_CONSTRUCT(*) builds a row object of all columns in Snowflake
# (performance_comparison.sql:16: ARRAY_AGG(OBJECT_CONSTRUCT(*))); Spark's
# struct(*) is the same shape, and ARRAY_AGG parses natively (alias of
# collect_list). The keyed form OBJECT_CONSTRUCT('k', v, …) maps to
# named_struct, which takes the identical alternating-argument list.
_OBJ_STAR_RE = re.compile(
    r"\bOBJECT_CONSTRUCT\s*\(\s*\*\s*\)", re.IGNORECASE
)
_OBJ_KEYED_RE = re.compile(r"\bOBJECT_CONSTRUCT\s*\(", re.IGNORECASE)
# `, LATERAL FLATTEN(input => expr) f` — Snowflake's table function for
# exploding arrays/objects — maps to Spark's LATERAL VIEW explode. Spark's
# generator alias takes the output column name directly, so `f.value`
# references keep working; only the VALUE output column is mapped (the
# reference corpus never reads FLATTEN's index/key/path outputs; extend the
# AS-list with posexplode if index is ever needed).
_FLATTEN_RE = re.compile(
    r",\s*LATERAL\s+FLATTEN\s*\(\s*input\s*=>\s*(?P<expr>[^)]+)\)"
    r"\s*(?P<alias>\w+)",
    re.IGNORECASE,
)


def translate(sql: str, anchor_date: str | None = ANCHOR_DATE) -> str:
    """Rewrite Snowflake-isms into Spark SQL.

    - ``QUALIFY pred`` → wrap-and-filter subquery (no QUALIFY in OSS Spark).
    - ``CURRENT_DATE`` / ``CURRENT_TIMESTAMP`` → anchored literals (pass
      ``anchor_date=None`` to keep wall-clock semantics).
    - ``OBJECT_CONSTRUCT(*)`` → ``struct(*)``; ``OBJECT_CONSTRUCT(k, v,…)``
      → ``named_struct(k, v,…)``. ``ARRAY_AGG``, ``DATE(x)``,
      ``INTERVAL '...'`` and date±int arithmetic parse natively in Spark
      SQL — no rewrite needed.
    - ``, LATERAL FLATTEN(input => x) f`` → ``LATERAL VIEW explode(x) f
      AS value`` (the VALUE output column only; FLATTEN's index/key/path
      outputs are unmapped — swap in posexplode if index is needed).

    KNOWN SEMANTIC DELTA (keyed OBJECT_CONSTRUCT only): Snowflake's
    OBJECT_CONSTRUCT **omits** key/value pairs whose value is NULL (and
    has KEEP_NULL / DISTINCT variants), while ``named_struct`` keeps the
    field with a NULL value — structs are fixed-shape, so the field
    cannot be dropped per-row. For NULL-free inputs (every keyed use in
    the reference corpus) the rewrite is exact; on null-bearing inputs
    downstream predicates like ``obj:k IS NULL`` flip from
    "key absent" to "field present, value NULL". If Snowflake's
    drop-null semantics are required, build a map and filter entries:
    ``map_filter(map(k1, v1, …), (k, v) -> v IS NOT NULL)``.
    """
    if anchor_date:
        sql = _CURRENT_DATE_RE.sub(f"DATE '{anchor_date}'", sql)
        sql = _CURRENT_TS_RE.sub(
            f"TIMESTAMP '{anchor_date} 00:00:00'", sql
        )
    sql = _OBJ_STAR_RE.sub("struct(*)", sql)
    sql = _OBJ_KEYED_RE.sub("named_struct(", sql)
    sql = _FLATTEN_RE.sub(
        lambda m: (
            f" LATERAL VIEW explode({m.group('expr').strip()})"
            f" {m.group('alias')} AS value"
        ),
        sql,
    )
    m = _QUALIFY_RE.match(sql.strip().rstrip(";"))
    if not m or "QUALIFY" not in sql.upper():
        return sql
    body, pred, tail = m.group("body"), m.group("pred"), m.group("tail")
    return f"SELECT * FROM ( {body.strip()} ) WHERE {pred.strip()} {tail.strip()}"


def run_snowflake_sql(
    spark: SparkSession, sql: str, anchor_date: str | None = ANCHOR_DATE
) -> DataFrame:
    """Execute reference-corpus SQL through the dialect shim."""
    return spark.sql(translate(sql, anchor_date))
