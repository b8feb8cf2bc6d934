"""Batch source/sink surface (the engine's O1 twin for bounded data).

Streaming sources live in ``streaming/sources.py``; this package covers
the batch side: schema-pinned readers for the formats the engine
supports, and scale-aware writers (partitioned / bucketed layouts —
the write-time half of the SCALE.md join story).
"""

from flink_wikipedia_spark.sources.batch import (
    read_csv,
    read_json_events,
    read_orc,
    read_parquet,
    write_orc,
    write_partitioned,
)

__all__ = [
    "read_csv", "read_json_events", "read_orc", "read_parquet",
    "write_orc", "write_partitioned",
]
