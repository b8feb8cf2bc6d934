"""Round-8 hardening pins (ADVICE r7): builder-persisted cache release,
strict local-cluster master parsing, and honored explicit iteration
budgets in connected_components."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


def test_pagerank_cache_is_tracked_and_released(spark):
    """q_pagerank_parts_suppliers persists its degreed edge list for the
    iteration loop; the persist must be tracked so release_caches() can
    free it after the caller consumes the result — without it every
    pagerank call leaked a fact-sized cached frame into the session.
    (Budget-mode pagerank is ALWAYS the lazy distributed ladder — the
    r12 small-graph guard applies only in convergence mode — so this
    pins the production path, no forcing needed.)"""
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.plans.registry import _LIVE_CACHES, release_caches

    release_caches()  # clean slate (other tests may have run queries)
    # other tests' own persists (and CacheManager plan-matching) are
    # session-global — clear the SQL caches and snapshot the residue
    # (RDD-level localCheckpoint blocks from the graph loop survive
    # clearCache and are reclaimed only by GC): the end-state assertion
    # is a DELTA against this baseline (round-9 full-suite lesson)
    spark.catalog.clearCache()
    from tests.test_round9_hardening import _persistent_ids

    baseline = _persistent_ids(spark)
    df = REGISTRY["q_pagerank_parts_suppliers"].fn(spark, SF_SMOKE)
    assert len(_LIVE_CACHES) == 1, "pagerank must register exactly one cache"
    cached = _LIVE_CACHES[0]
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    df.count()  # the action that materializes (and caches) the edge list
    # Round 9 made release automatic (an async QueryExecutionListener
    # may free the cache before we do) — the invariant is the
    # post-state, not which path released: after a synchronous
    # release_caches() nothing is tracked and nothing NEW stays
    # persistent.
    release_caches()
    assert not _LIVE_CACHES
    import time as _time

    deadline = _time.time() + 10
    while _time.time() < deadline and not (_persistent_ids(spark) <= baseline):
        _time.sleep(0.2)
    assert _persistent_ids(spark) <= baseline


def test_release_caches_survives_stopped_session():
    """release_caches() must be safe to call on frames whose session is
    gone (embedding drivers often tear down Spark first)."""
    from flink_wikipedia_spark.plans.registry import _LIVE_CACHES, release_caches

    class _Dead:
        def unpersist(self):
            raise RuntimeError("JVM gone")

    _LIVE_CACHES.append(_Dead())
    assert release_caches() == 0  # swallowed, not raised
    assert not _LIVE_CACHES


@pytest.mark.parametrize(
    "bad",
    [
        "local-cluster[4, 8, 4096x]",
        "local-cluster[4;8;4096]",
        "local-cluster[4,8]",
        "local-cluster[a,b,c]",
    ],
)
def test_malformed_local_cluster_master_rejected(bad):
    """get_spark must reject malformed local-cluster masters loudly —
    the old rstrip/split parse turned 'local-cluster[4, 8, 4096]' into
    spark.executor.memory=' 4096m' and a confusing JVM startup failure
    (ADVICE r7). Whitespace around the fields is fine; anything else is
    a ValueError BEFORE any JVM is started."""
    from flink_wikipedia_spark.session import get_spark

    with pytest.raises(ValueError, match="local-cluster"):
        get_spark("tests-badmaster", master=bad)


def test_star_explicit_budget_is_honored(spark):
    """An explicit max_iter must bound star's work as written: on a
    graph needing more alternations than the budget, the operator
    raises (non-fixed-point) rather than silently raising the budget to
    50 — the pre-round-8 behavior (ADVICE r7)."""
    from flink_wikipedia_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(127)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError):
        connected_components(
            chain, small_graph_edges=0, algorithm="star", max_iter=1
        ).collect()
    # the default budget (None -> 50) still converges on the same graph
    got = {
        r.node: r.component
        for r in connected_components(
            chain, small_graph_edges=0, algorithm="star"
        ).collect()
    }
    assert got == {i: 0 for i in range(128)}
