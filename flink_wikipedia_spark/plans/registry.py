"""Registry wiring query names to Spark builders and DuckDB oracles.

Driver contract (``__spark_entry__.py``): each query is a callable
``(spark, sf_dir) -> DataFrame``; its oracle is ANSI SQL DuckDB runs on
the same parquet tables. Column names/aliases must match exactly —
the driver sorts columns by name before hashing values.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flink_wikipedia_spark.functions.compat import ensure_session_conf


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None ⇒ non-SQL-expressible; driver does rows-only check
    doc: str
    alias_of: str | None = None  # set ⇒ duplicate name for an existing query


REGISTRY: dict[str, QueryDef] = {}


def alias(new_name: str, existing: str) -> None:
    """Register an additional name for an existing query (used where
    SURVEY.md §2 names an inventory query differently than the primary
    registration — the driver and judge key off names). Aliases stay in
    the driver contract (queries()/oracle_sql()) but are EXCLUDED from
    bench totals and the plan audit via ``alias_of`` — otherwise the
    same physical query is timed and audited twice and suite totals
    stop being comparable across rounds."""
    qd = REGISTRY[existing]
    REGISTRY[new_name] = QueryDef(new_name, qd.fn, qd.oracle, qd.doc, alias_of=existing)


def query(name: str, oracle: str | None = None):
    """Register a query builder. ``oracle`` is the DuckDB twin SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(name, wrapped, oracle, fn.__doc__ or "")
        return wrapped

    return deco
