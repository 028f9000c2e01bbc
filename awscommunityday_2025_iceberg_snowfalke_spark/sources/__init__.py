"""Table registry + readers/writers (SURVEY §2.1 S1-S8).

The reference's sources are: external Parquet with inferred schema
(performance_comparison.sql:14-21), an Iceberg table through a catalog
(terraform/main.tf:91-136), CSV profile loads (generate_sample_data.py:178-183)
and Hive-partitioned file layouts (generate_sample_data.py:106,135). Spark
gives us all of these declaratively; this module is the single place that
knows where tables live and how they are laid out.
"""

from .registry import TABLES, load, load_all, register_views, events_with_props
from .writers import write_partitioned, write_csv, ctas_hot_tier

__all__ = [
    "TABLES",
    "load",
    "load_all",
    "register_views",
    "events_with_props",
    "write_partitioned",
    "write_csv",
    "ctas_hot_tier",
]
