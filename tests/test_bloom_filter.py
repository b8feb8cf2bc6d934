"""Scale evidence: runtime Bloom-filter semi-join pruning.

At 100 TB the dominant join shape is selective-dim ⋈ huge-fact where the
dim side is too large to broadcast (autoBroadcastJoinThreshold misses),
so both sides shuffle. Spark's runtime filter injection
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, default on) builds a
Bloom filter over the creation (dim) side's join keys and applies
`might_contain` as a pre-shuffle filter on the fact scan — fact rows that
cannot join are dropped BEFORE the exchange, shrinking the big shuffle by
the dim's selectivity. That's the row-level complement to partition
pruning (test_partition_pruning.py) and bucketing (test_bucketing.py).

The 10 GB `applicationSideScanSizeThreshold` default means the rewrite
never fires at test SFs, so these tests lower the thresholds to force
injection and pin (a) that the plan actually contains the
bloom_filter_agg → might_contain pair on the fact side, and (b) that the
rewrite is semantics-preserving (same rows with the optimizer on/off).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_wikipedia_spark.schemas import load_table

SF_SMOKE = "/root/testdata/sf0.001"

# Force injection at toy scale: no broadcast (else Spark rightly skips
# the bloom filter), zero application-side floor, creation side allowed.
_FORCE = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def _with_confs(spark, confs):
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _selective_join(spark):
    """lineitem (fact) ⋈ orders filtered to one priority (selective dim)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderpriority"
    )


def test_bloom_filter_injected_on_fact_side(spark):
    prev = _with_confs(spark, _FORCE)
    try:
        j = _selective_join(spark)
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        # creation side: an aggregate building the filter over dim keys
        assert "bloom_filter_agg" in opt, opt[:2000]
        # application side: the probe guarding the fact scan
        assert "might_contain" in opt, opt[:2000]
        # and it survives into the physical plan (not optimized back out)
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys, phys[:2000]
    finally:
        _restore(spark, prev)


def test_bloom_filter_rewrite_preserves_results(spark):
    prev = _with_confs(spark, _FORCE)
    try:
        with_bloom = sorted(map(tuple, _selective_join(spark).collect()))
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        without = sorted(map(tuple, _selective_join(spark).collect()))
        assert with_bloom == without
        assert len(with_bloom) > 0
    finally:
        _restore(spark, prev)
