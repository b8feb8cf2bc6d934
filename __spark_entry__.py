"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``flink_wikipedia_spark/plans/queries_*.py`` —
one registry entry per implemented operator from SURVEY.md §2 and the
north-star extensions; this module only adapts the registry to the
driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_wikipedia_spark.plans import REGISTRY  # noqa: E402
from flink_wikipedia_spark.schemas import SMOKE_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference DataStreamJob.java:61-87 as batch) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q_windowed_edit_size"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north star)."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; queries without one (UDF-backed / approximate ops)
    get the driver's rows-only check."""
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }
