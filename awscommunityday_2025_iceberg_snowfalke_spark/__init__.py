"""PySpark-native analytics engine with the query/data-processing surface of
the reference repo (jverhoeks/awscommunityday-2025-iceberg-snowfalke — a
Snowflake-over-Iceberg demo stack).

The reference computes: a relational query corpus (scans, joins, windows,
funnels, maintenance analytics) over an event-stream + profile data model,
plus table-lifecycle semantics (time travel, compaction, tiering). This
package re-expresses all of it Spark-first — declarative DataFrame/SQL plans
optimized by Catalyst — and extends it with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Layout:
    session      SparkSession factory tuned for local[N] and cluster scale
    sources      table registry / readers / writers / partitioned layouts
    operators    the query corpus: relational, windows, tpch, lifecycle,
                 dedup, similarity, textstats, multimodal
    functions    scalar helpers (JSON props, date helpers, masking, vectors)
    plans        plan inspection + bench listener utilities
    streaming    micro-batch ingest + dynamic-table (continuous refresh)
"""

__version__ = "0.1.0"
