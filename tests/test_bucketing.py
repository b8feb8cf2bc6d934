"""Scale evidence: bucketed tables make the orders⋈lineitem join
shuffle-free — the write-time layout SCALE.md prescribes for the one
unavoidable fact⋈fact shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_wikipedia_spark.schemas import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    # external tables at explicit paths (warehouse.dir is a static conf)
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(wh / "orders_b")).saveAsTable("orders_b"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(wh / "lineitem_b")).saveAsTable("lineitem_b"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # force the sort-merge path (at test SF everything fits a broadcast,
    # which would bypass the bucketing machinery being demonstrated)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_bucketed_join(spark, ot, lt)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _assert_bucketed_join(spark, ot, lt):
    o = spark.table(ot)
    li = spark.table(lt)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the JOIN itself must not exchange: both sides are pre-bucketed on
    # the join key (the aggregate after it may still shuffle its 5 rows)
    join_part = plan.split("HashAggregate")[-1]  # below the aggregates
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # and the result is right
    expected = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
    )
    got = {r.o_orderpriority: r.n for r in joined.collect()}
    want = {r.o_orderpriority: r["count"] for r in expected.collect()}
    assert got == want
