"""Scale evidence: AQE splits skewed join partitions at runtime — the
engine's posture for skewed JOIN keys (salting covers skewed AGG keys,
q_salted_agg_edit_size; bucketing covers the co-located join,
test_bucketing.py). A web-scale corpus join on domain/language is
exactly this shape: one key carries most of the volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    # 95% of fact rows share one key — the classic hot-domain shape.
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    confs = {
        # force the sort-merge path and make the tiny test data look skewed
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = fact.join(dim, "k").groupBy("name").agg(F.sum("v").alias("s"))
        # collect() runs the DataFrame's OWN QueryExecution (a .write
        # would spawn a fresh one), so AQE finalizes the plan we inspect
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the adaptive final plan marks the rebalanced join "skew=true"
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_plain_join(spark):
    from flink_wikipedia_spark.operators.skew import salted_join

    fact = spark.range(0, 50_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # left join keeps unmatched fact rows exactly once
    dim_partial = dim.filter(F.col("k") < 50)
    pl = fact.join(dim_partial, "k", "left").select("k", "v", "name")
    sl = salted_join(fact, dim_partial, "k", how="left").select("k", "v", "name")
    assert sorted(map(tuple, pl.collect())) == sorted(map(tuple, sl.collect()))
