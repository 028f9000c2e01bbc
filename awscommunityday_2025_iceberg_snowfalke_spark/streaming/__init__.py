"""Structured-Streaming surface (SURVEY §2.1 S10-S11, §2.12).

The reference's 'streaming' is micro-batch file landing (Firehose buffers →
S3 files every 300 s, P:610-623; the small-file generator GEN:83-110) plus
continuously-refreshed aggregates (dynamic tables with TARGET_LAG,
P:753-766). The Spark-native equivalents:

- file-source ingest: ``readStream`` over a landing directory →
  ``trigger(availableNow=True)`` micro-batches → partitioned sink,
- dynamic table: ``foreachBatch`` overwrite of a materialized aggregate,
- plus watermarked windowed aggregation as a clearly-labeled extension
  (the reference has no true event-time semantics).
"""

from .jobs import (
    QUERIES,
    ORACLE,
    ingest_file_stream,
    refresh_dynamic_table,
    simulate_small_file_landing,
)

__all__ = [
    "QUERIES",
    "ORACLE",
    "ingest_file_stream",
    "refresh_dynamic_table",
    "simulate_small_file_landing",
]
