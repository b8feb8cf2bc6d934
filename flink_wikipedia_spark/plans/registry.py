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
# register such frames here. Release is AUTOMATIC: the first registry
# call on a session installs a QueryExecutionListener that frees every
# MATERIALIZED tracked frame after each action completes (the K
# PageRank iterations share the cache within one action; across
# actions a fresh run re-materializes — correct, and never a leak).
# ``release_caches()`` stays public for gates (tools/verify_local.py,
# bench.py call it between queries, synchronously — the listener fires
# on the async listener bus) and for non-registry embedders;
# ``spark.catalog.clearCache()`` also subsumes it.
_LIVE_CACHES: list[DataFrame] = []
_CACHES_LOCK = __import__("threading").Lock()
_log = __import__("logging").getLogger(__name__)


def track_cache(df: DataFrame) -> DataFrame:
    """Record a builder-persisted frame for later release_caches()."""
    with _CACHES_LOCK:
        _LIVE_CACHES.append(df)
    return df


def _session_stopped(df: DataFrame) -> bool:
    try:
        sc = df.sparkSession.sparkContext
        return sc._jsc is None or sc._jsc.sc().isStopped()
    except Exception:
        return True


def _buffers_loaded(df: DataFrame) -> bool | None:
    """True/False = this frame's cache buffers are/aren't materialized;
    None = no CacheManager entry at all (already unpersisted). Any
    introspection failure (internal API drift across Spark versions)
    reports True — worst case an eager release costs a re-derivation,
    never correctness."""
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        cd = cm.lookupCachedData(df._jdf)
        if not cd.isDefined():
            return None
        return bool(
            cd.get().cachedRepresentation().cacheBuilder()
            .isCachedColumnBuffersLoaded()
        )
    except Exception:
        return True


def release_caches(materialized_only: bool = False) -> int:
    """Unpersist builder-persisted frames; returns the count released.

    With ``materialized_only`` (the listener's mode), frames whose cache
    buffers were never loaded are kept tracked: an action on an
    UNRELATED DataFrame must not strip a cache intent the tracked
    frame's own upcoming action relies on."""
    n = 0
    with _CACHES_LOCK:
        frames = list(_LIVE_CACHES)
        keep: list[DataFrame] = []
        for df in frames:
            loaded = _buffers_loaded(df) if materialized_only else True
            if loaded is False:
                keep.append(df)
                continue
            if loaded is None:  # already gone from the CacheManager
                continue
            try:
                df.unpersist()
                n += 1
            except Exception as exc:
                # ADVICE r8: only the stopped-session case is expected
                # here; anything else is a real failure — surface it.
                if not _session_stopped(df):
                    _log.warning("release_caches: unpersist failed: %s", exc)
        _LIVE_CACHES[:] = keep
    return n


class _CacheReleaseListener:
    """py4j-implemented org.apache.spark.sql.util.QueryExecutionListener:
    after any action completes (success or failure), free tracked frames
    whose buffers materialized during it. Driver-side only; fires on the
    listener bus, so gates that need synchronous reclamation still call
    release_caches() directly."""

    class Java:
        implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

    def onSuccess(self, funcName, qe, durationNs):
        try:
            release_caches(materialized_only=True)
        except Exception:  # never poison the listener bus
            _log.exception("cache-release listener failed")

    def onFailure(self, funcName, qe, exception):
        self.onSuccess(funcName, qe, None)

    # py4j object-protocol hooks the JVM may invoke on any callback
    def toString(self):
        return "PythonCacheReleaseListener"

    def equals(self, other):
        return other is self

    def hashCode(self):
        # Java int range (ADVICE r9): id(self) is ~2^47 on 64-bit
        # CPython; py4j would encode it as a long and any JVM-side
        # hashCode() unboxing to int would fail on the listener bus.
        return id(self) & 0x7FFFFFFF


_LISTENER_APP_IDS: set[str] = set()


def install_cache_release_listener(spark: SparkSession) -> None:
    """Idempotently attach the auto-release listener to this app's
    session (keyed by applicationId — getOrCreate reuses sessions).
    Requires the py4j callback server; pyspark starts it on demand.

    An atexit hook unregisters the listener: when the interpreter exits
    without spark.stop(), the JVM listener bus would otherwise keep
    calling back into a dying py4j callback server and spray protocol
    errors over stderr during teardown (observed in round-9 profiling)."""
    try:
        app_id = spark.sparkContext.applicationId
        if app_id in _LISTENER_APP_IDS:
            return
        from pyspark.java_gateway import ensure_callback_server_started

        ensure_callback_server_started(spark.sparkContext._gateway)
        listener = _CacheReleaseListener()
        manager = spark._jsparkSession.listenerManager()
        manager.register(listener)
        _LISTENER_APP_IDS.add(app_id)

        import atexit

        def _unregister() -> None:
            try:
                manager.unregister(listener)
            except Exception:
                pass  # JVM already gone — nothing left to call back

        atexit.register(_unregister)
    except Exception as exc:
        # Auto-release is an ergonomics layer; the synchronous
        # release_caches() contract still holds without it.
        _log.warning("cache-release listener not installed: %s", exc)


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
            install_cache_release_listener(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(name, wrapped, oracle, fn.__doc__ or "")
        return wrapped

    return deco
