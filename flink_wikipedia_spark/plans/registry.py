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

# Frames a query builder persisted to serve its own multi-pass plan
# (e.g. PageRank's degreed edge list, reused across K iterations).
# Spark gives the builder no hook to unpersist AFTER the caller's
# action — the DataFrame contract returns a lazy plan — so builders
# register such frames here and embedding drivers call
# ``release_caches()`` once the result is consumed (ADVICE r7: without
# this, every pagerank call leaked a fact-sized cached frame into the
# session). The gates (tools/verify_local.py, bench.py) call it between
# queries; ``spark.catalog.clearCache()`` also subsumes it.
_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Record a builder-persisted frame for later release_caches()."""
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every builder-persisted frame; returns the count."""
    n = 0
    for df in _LIVE_CACHES:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _LIVE_CACHES.clear()
    return n


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
