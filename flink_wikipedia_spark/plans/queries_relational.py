"""Relational-breadth queries (SURVEY.md §2.2 / E4–E10): joins, sorts,
set ops, rollup/cube, analytic windows, sessionization, as-of and range
joins, TPC-H-style multi-join aggregates.

None of these exist in the reference (its repo greps clean for
join/union/sort, SURVEY.md §2.2); this is the surface a user of any
real analytics engine expects, expressed so Catalyst picks the physical
strategy (broadcast vs sort-merge, AQE skew splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import (
    DEC,
    dec_avg,
    dec_sum,
    dec_to_double_portable,
    sql_dec_sum_duckdb,
    sql_dec_to_double_duckdb,
)
from flink_wikipedia_spark.operators.relational import (
    asof_join,
    range_join_count,
    topk_per_group,
)
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread


@query(
    "q_join_orders_customer",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           {sql_dec_sum_duckdb("o.o_totalprice")} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: fact⋈dim equi-join + aggregate. `customer` joins un-hinted:
    the planner broadcasts it from file stats while it fits (so at
    small SF the orders side never shuffles for this join), and falls
    back to a shuffled join at the scale where 150M customers cannot
    ride a broadcast. Only the 5-row aggregate exchange is fixed."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "q_tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum_duckdb("l_quantity")} AS sum_qty,
           {sql_dec_sum_duckdb("l_extendedprice")} AS sum_base_price,
           {sql_dec_sum_duckdb("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {sql_dec_sum_duckdb("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           {sql_dec_sum_duckdb("l_quantity")} / COUNT(l_quantity) AS avg_qty,
           {sql_dec_sum_duckdb("l_discount")} / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy single-table aggregate — the canonical
    partial-aggregate / whole-stage-codegen benchmark. 6 aggregates over
    ~600k rows at sf0.1 collapse to 6 output rows; the shuffle carries
    only partials. Per-row products (price×(1-disc)×(1+tax)) are
    left-associated identically in Spark and the oracle, so the
    decimal-cast of each product is bit-identical."""
    li = load_table_spread(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_disc", "count_order",
        )
    )


@query(
    "q_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey AS orderkey,
           {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-10.
    customer(filtered) auto-broadcasts into orders while it fits the
    threshold (un-hinted — at SF1000 it shuffles); orders⋈lineitem is the
    one real shuffle (both sides hash on orderkey — at scale, bucketing
    both tables by orderkey makes it shuffle-free). Top-10 via
    TakeOrderedAndProject: no global sort ever materializes."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("orderkey", "revenue", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


@query(
    "q_tpch_q5_regional_revenue",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_tpch_q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. The constant dims (region, nation)
    are forced broadcasts; customer and supplier join un-hinted (auto-
    broadcast while under the threshold, shuffled at SF1000); the one
    unavoidable shuffle joins orders to lineitem on orderkey. Catalyst
    + AQE order the join tree; we only declare it."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q_semijoin_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
    )
    """,
)
def q_semijoin_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 (semi): customers with ≥1 large order. left_semi join — probe
    side streams, no fact columns survive the join, no duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_antijoin_quiet_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def q_antijoin_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 (anti): customers with no URGENT orders. left_anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_top_events_by_value",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 100
    """,
)
def q_top_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: global top-k. Spark executes orderBy().limit(k) as
    TakeOrderedAndProject — per-partition top-k then a k-row merge at
    the driver; the full sort never happens. event_id tiebreak makes the
    cut deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
    )


@query(
    "q_setops_users",
    oracle="""
    SELECT user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        UNION
        SELECT user_id FROM events WHERE event_type = 'signup'
    )
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def q_setops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: UNION (distinct) + EXCEPT. Set ops are aggregates in
    disguise — each is one hash shuffle on the full row."""
    ev = load_table(spark, sf_dir, "events")
    u = lambda t: ev.filter(F.col("event_type") == t).select("user_id")  # noqa: E731
    return u("purchase").union(u("signup")).distinct().subtract(u("error"))


@query(
    "q_rollup_event_value",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dec_sum_duckdb("value")} AS total_value
    FROM events
    GROUP BY ROLLUP(event_type)
    """,
)
def q_rollup_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: rollup — per-type subtotals + grand total in one pass
    (Spark expands grouping sets before the single shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.rollup("event_type").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value").alias("total_value")
    )


@query(
    "q_cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           {sql_dec_sum_duckdb("o_totalprice")} AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 (cube): all 2^2 grouping sets in one aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice").alias("revenue")
    )


@query(
    "q_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 (exact twin): per-type distinct users. Spark plans
    count(distinct) as a two-phase expand+aggregate. The approximate
    HLL path is `q_approx_distinct_users` (rows-only check — estimates
    differ across engines by construction)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("q_approx_percentile_value", oracle=None)
def q_approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch family, percentile form: approx_percentile's
    fixed-size mergeable summary next to the exact interpolated twin
    q_median_value — at 100 TB the exact form needs per-group sorts,
    the sketch is one pass. Rows-only check (estimates are
    engine-specific by construction, like HLL). One sketch per group
    serves both percentiles; emitted as scalar doubles (p50, p90) —
    flat columns, not an array, so any downstream hasher sees hashable
    scalars."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, array(0.5, 0.9), 1000)").alias("p")
        )
        .select(
            "event_type",
            F.element_at("p", 1).alias("p50"),
            F.element_at("p", 2).alias("p90"),
        )
    )


@query("q_approx_distinct_users", oracle=None)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 (HLL): approx_count_distinct at 2% rsd. At 100 TB this is the
    only viable distinct-count: fixed-size sketch, one pass, partials
    merge associatively. No oracle — HLL estimates are
    engine-specific; the driver's rows-only check pins shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("n_users_approx")
    )


@query(
    "q_topk_docs_per_lang",
    oracle="""
    SELECT doc_id, lang, n_chars, rk FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk
        FROM documents
    ) WHERE rk <= 3
    """,
)
def q_topk_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: top-k per group via ranked window — one shuffle on the
    partition key, per-partition sort, early filter on rank."""
    docs = load_table(spark, sf_dir, "documents")
    return topk_per_group(
        docs.select("doc_id", "lang", "n_chars"),
        ["lang"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        3,
    ).select("doc_id", "lang", "n_chars", F.col("rk").cast("long").alias("rk"))


@query(
    "q_user_event_gaps",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_gaps,
           CAST(SUM(gap_s) AS BIGINT) AS total_gap_s,
           MAX(gap_s) AS max_gap_s
    FROM (
        SELECT user_id,
               tss - LAG(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS gap_s
        FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events)
    ) WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def q_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (lag): inter-event gaps per user. Timestamps are reduced to
    whole epoch seconds *before* arithmetic so ns-vs-µs parquet
    precision can't leak into values (FIXTURES.md oracle notes)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("tss")
    )
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    gaps = ev.withColumn("gap_s", F.col("tss") - F.lag("tss").over(w)).filter(
        F.col("gap_s").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("total_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


@query(
    "q_running_total",
    oracle=f"""
    SELECT user_id, event_id,
           {sql_dec_to_double_duckdb("run_sum")} AS running_value
    FROM (
        SELECT user_id, event_id,
               SUM(CAST(value AS DECIMAL(28,6))) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum
        FROM events
    )
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (frames): cumulative per-user spend. The running sum is decimal
    so every prefix is exact — order-dependence of FP addition can't
    diverge from the oracle."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        # portable split conversion: a direct decimal->double cast
        # double-rounds once the scaled sum passes 2^53 (compat.py)
        dec_to_double_portable(
            F.sum(F.col("value").cast("decimal(28,6)")).over(w)
        ).alias("running_value"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH t AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events
    ), flagged AS (
        SELECT user_id, event_id, tss,
               CASE WHEN tss - LAG(tss) OVER w > 1800 OR LAG(tss) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    ), sess AS (
        SELECT user_id, event_id, tss,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY tss, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(tss) AS session_start_s, MAX(tss) AS session_end_s
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the reference's tumbling windows generalized
    to gap-based sessions, cf. session_window in streaming/): new
    session when >30 min idle; session id = running count of session
    starts. Two analytic windows over ONE shuffle (same partition+order
    key reused — Spark plans a single Exchange+Sort)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("tss")
    )
    w = Window.partitionBy("user_id").orderBy("tss", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (F.col("tss") - F.lag("tss").over(w) > 1800)
            | F.lag("tss").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wc).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tss").alias("session_start_s"),
        F.max("tss").alias("session_end_s"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss, value
        FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss,
               arg_max(value, event_id) AS view_value
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT)
    )
    SELECT p.event_id, p.user_id, p.value, v.view_value
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.tss >= v.tss
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no Spark built-in; DuckDB's native ASOF JOIN is the
    oracle): each purchase picks the user's latest prior-or-equal view's
    value. Implemented as the union + last-ignoring-nulls merge —
    one shuffle, no range nested-loop (operators/relational.asof_join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("tss"), "value"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.unix_timestamp("ts").alias("tss"), "event_id", "value")
        .groupBy("user_id", "tss")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    return asof_join(
        purchases, views, on="user_id", left_ts="tss", right_ts="tss",
        value_cols=["view_value"],
    ).select("event_id", "user_id", "value", "view_value")


@query(
    "q_range_join_counts",
    oracle="""
    WITH errors AS (
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss
        FROM events WHERE event_type = 'error'
    ), purchases AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss
        FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id,
           COUNT(p.tss) AS n_in_range
    FROM errors e LEFT JOIN purchases p
      ON p.user_id = e.user_id AND p.tss > e.tss AND p.tss <= e.tss + 3600
    GROUP BY e.event_id, e.user_id
    """,
)
def q_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: purchases within 1h after each error, per
    user. Bucket-equi-join implementation (2 candidate buckets per left
    row) — Catalyst gets an equi-join it can hash; the oracle uses the
    naive theta join DuckDB can afford at sf0.01
    (operators/relational.range_join_count)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("tss")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp("ts").alias("tss")
    )
    return range_join_count(
        errors, purchases, on="user_id", left_ts="tss", right_ts="tss",
        range_sec=3600,
    ).select("event_id", "user_id", "n_in_range")


@query(
    "q_gapfill_rollup",
    oracle=f"""
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               {sql_dec_sum_duckdb("value")} AS sum_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1
        FROM agg GROUP BY 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        FROM bounds
    )
    SELECT s.event_type, s.bucket,
           COALESCE(a.n_events, 0) AS n_events,
           a.sum_value AS sum_value,
           last_value(a.sum_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM spine s LEFT JOIN agg a USING (event_type, bucket)
    """,
)
def q_gapfill_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup with gap filling: hourly
    (event_type, bucket) aggregates densified onto a complete per-type
    hour spine, empty buckets carrying count 0 and a LOCF
    (last-observation-carried-forward) interpolated value — the
    time_bucket_gapfill + locf() idiom of time-series stores.

    Scale: the rollup is ONE shuffle on (event_type, hour) with map-side
    partials; the spine is generated from a |types|-row bounds table
    (sequence+explode — rows created, never scanned) and joins back on
    the same key. The LOCF window partitions by event_type, but its
    partition size is bounded by CALENDAR hours, not corpus size — a
    century is <1M rows per type — so the low-cardinality partition key
    is safe here, unlike over raw events."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )
    bounds = agg.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.expr("interval 1 hour"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            "sum_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


@query(
    "q_data_quality_audit",
    oracle="""
    SELECT 'lineitem_null_orderkey' AS rule,
           CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS n_violations,
           COUNT(*) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity',
           CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT), COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
           COUNT(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_ship_before_order',
           CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS BIGINT),
           COUNT(*)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST(COUNT(*) AS BIGINT), (SELECT COUNT(*) FROM lineitem)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(COUNT(*) AS BIGINT), (SELECT COUNT(*) FROM orders)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation audit (the dbt-test / Deequ shape): null,
    range, cross-column, and referential-integrity rules evaluated as
    one row per rule with violation and checked counts — the report a
    pipeline gates a 100 TB ingest on.

    Scale: single-table rules share ONE scan each via conditional
    aggregation (never a scan per rule); the temporal rule is a
    fact⋈fact equi-join on the order key — shuffled, never broadcast
    (orders grows with the data: 150M rows at sf100 blew the 8 GB
    broadcast ceiling before round 7 removed the forced broadcast);
    FK-orphan rules are LEFT ANTI counts (the cheapest existence check
    — no row wider than the key crosses the wire). Every branch reduces
    to a single row before the union, so the result is |rules| rows
    regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def rules(df, named_predicates):
        # ALL of a table's row-local rules fold into ONE aggregate over
        # ONE scan (a rule-per-agg form rescans the table per rule),
        # then the single wide row unpivots to (rule, counts) rows.
        wide = df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            *[
                F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
                for name, pred in named_predicates
            ],
        )
        stacked = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"), F.col(name).alias("n_violations")
                    )
                    for name, _ in named_predicates
                ]
            )
        ).alias("r")
        return wide.select(stacked, "n_checked").select(
            "r.rule", "r.n_violations", "n_checked"
        )

    def orphan(name, df, keys, dim, dim_keys):
        # total rides as a broadcast single row — never an eager count
        # at plan-build time (an action here would run jobs on explain)
        total = df.agg(F.count(F.lit(1)).alias("n_checked"))
        return (
            df.join(
                dim.select(*dim_keys).distinct(),
                [df[a] == dim[b] for a, b in zip(keys, dim_keys)],
                "left_anti",
            )
            .agg(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
            .crossJoin(F.broadcast(total))
        )

    shipped = li.join(
        # no broadcast hint: orders is fact-sized (1.5B rows at TPC-H
        # SF1000), so this must stay a shuffled equi-join; both sides
        # hash on the order key, the natural co-partitioning.
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        rules(
            li,
            [
                ("lineitem_null_orderkey", F.col("l_orderkey").isNull()),
                ("lineitem_nonpositive_quantity", F.col("l_quantity") <= 0),
                (
                    "lineitem_discount_out_of_range",
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
                ),
            ],
        )
        .unionAll(
            rules(
                shipped,
                [("lineitem_ship_before_order", F.col("l_shipdate") < F.col("o_orderdate"))],
            )
        )
        .unionAll(
            orphan("lineitem_orphan_orderkey", li, ["l_orderkey"], o, ["o_orderkey"])
        )
        .unionAll(orphan("orders_orphan_custkey", o, ["o_custkey"], c, ["c_custkey"]))
    )


# Pivot/unpivot: the reshaping pair. The pivot value list is FIXED
# (Spark requires it for a deterministic schema anyway, and an
# unlisted-value explosion is exactly what you don't want at 100 TB —
# pivot with inferred values runs an extra distinct pass over the fact
# table first).
PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot_event_daily",
    oracle=f"""
    SELECT day,
           {sql_dec_to_double_duckdb("click")} AS click,
           {sql_dec_to_double_duckdb("error")} AS error,
           {sql_dec_to_double_duckdb("purchase")} AS purchase,
           {sql_dec_to_double_duckdb("signup")} AS signup,
           {sql_dec_to_double_duckdb("view")} AS view
    FROM (
        SELECT date_trunc('day', ts) AS day,
               SUM(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS click,
               SUM(CASE WHEN event_type = 'error'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS error,
               SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS purchase,
               SUM(CASE WHEN event_type = 'signup'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS signup,
               SUM(CASE WHEN event_type = 'view'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS view
        FROM events
        GROUP BY date_trunc('day', ts)
    )
    """,
)
def q_pivot_event_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational reshaping (pivot): daily long→wide of per-type value
    sums. Spark's groupBy().pivot(col, values) with an EXPLICIT value
    list compiles to exactly one partial/final hash aggregate with
    conditional sums — same plan as the oracle's CASE form, one
    shuffle, no per-value scans and no values-inference pass (which at
    100 TB would be a full extra distinct over the facts). Decimal
    accumulators for order-independent bit-exact totals (compat.DEC
    rules); null cells stay null (no matching rows), matching SQL
    conditional-aggregation semantics."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
            F.col("value").cast(DEC).alias("v"),
        )
        .groupBy("day")
        .pivot("event_type", PIVOT_EVENT_TYPES)
        # portable split conversion: a direct decimal->double cast
        # double-rounds once the scaled sum passes 2^53 (compat.py)
        .agg(dec_to_double_portable(F.sum("v")))
    )


@query(
    "q_unpivot_event_daily",
    oracle=f"""
    WITH dec_wide AS (
        SELECT date_trunc('day', ts) AS day,
               SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS purchase,
               SUM(CASE WHEN event_type = 'error'
                    THEN CAST(value AS DECIMAL(28,6)) END) AS error
        FROM events
        GROUP BY date_trunc('day', ts)
    ),
    wide AS (
        SELECT day,
               {sql_dec_to_double_duckdb("purchase")} AS purchase,
               {sql_dec_to_double_duckdb("error")} AS error
        FROM dec_wide
    )
    SELECT day, kind, amount FROM (
        SELECT day, 'purchase' AS kind, purchase AS amount FROM wide
        UNION ALL
        SELECT day, 'error' AS kind, error AS amount FROM wide
    ) WHERE amount IS NOT NULL
    """,
)
def q_unpivot_event_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational reshaping (unpivot / melt): wide→long back-transform
    of the pivoted frame via DataFrame.unpivot — a Generate (Expand)
    node, map-only over the already-aggregated wide frame, no shuffle
    beyond the upstream pivot's. Null cells are dropped, mirroring the
    oracle's WHERE amount IS NOT NULL (Spark's unpivot keeps nulls, so
    the filter is explicit)."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
            F.col("value").cast(DEC).alias("v"),
        )
        .groupBy("day")
        .pivot("event_type", ["purchase", "error"])
        .agg(dec_to_double_portable(F.sum("v")))
    )
    return wide.unpivot(
        "day", ["purchase", "error"], "kind", "amount"
    ).filter(F.col("amount").isNotNull())


@query(
    "q_funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    s2 AS (
        SELECT user_id, ts, event_type, t1,
               MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
        FROM s1
    ),
    s3 AS (
        SELECT user_id, t1, t2,
               MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY user_id) AS t3
        FROM s2
    ),
    per_user AS (
        SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        FROM s3 GROUP BY user_id
    )
    SELECT 1 AS stage, 'view' AS step, COUNT(t1) AS n_users FROM per_user
    UNION ALL
    SELECT 2 AS stage, 'click' AS step, COUNT(t2) AS n_users FROM per_user
    UNION ALL
    SELECT 3 AS stage, 'purchase' AS step, COUNT(t3) AS n_users FROM per_user
    """,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral analytics (ordered funnel): how many users progressed
    view → click → purchase IN ORDER (each later step strictly after
    the user's first completion of the previous one). Stage times are
    layered per-user window minimums — t2 is the min click time after
    t1, t3 the min purchase after t2 — so the whole funnel is three
    window passes over ONE hash partitioning on user_id (consecutive
    windows with the same partition key reuse the exchange; no
    self-joins, which is how funnel queries usually go quadratic).

    Scale: one shuffle on user_id carries the funnel; the final
    per-user collapse and 3-row union are trivial."""
    ev = load_table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id")
    s1 = ev.select(
        "user_id", "ts", "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(uw).alias("t1"),
    )
    s2 = s1.select(
        "user_id", "ts", "event_type", "t1",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(uw).alias("t2"),
    )
    s3 = s2.select(
        "user_id", "t1", "t2",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(uw).alias("t3"),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    # ONE aggregate row carries all three stage counts, stacked to long
    # form map-side — a 3-way unionAll here would re-plan (and re-scan)
    # the whole per-user subtree per branch, Catalyst having no logical
    # CSE (the same trap BASELINE.md documents for TF-IDF join-backs).
    counts = per_user.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
    )
    return counts.selectExpr(
        "stack(3, 1, 'view', c1, 2, 'click', c2, 3, 'purchase', c3) "
        "AS (stage, step, n_users)"
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firstday AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS BIGINT)
               AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN firstday f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral analytics (cohort retention): users grouped by first
    active day, counted per day-offset of later activity — the classic
    retention triangle. One aggregate derives cohorts; the join back is
    on user_id (same key as the aggregate, so AQE reuses partitioning
    or broadcasts the per-user frame when small); final distinct-count
    per (cohort, offset)."""
    ev = load_table(spark, sf_dir, "events")
    # cohort_day as a per-user window minimum instead of a groupBy +
    # join-back: ONE scan and one user_id shuffle feed the final
    # (cohort, offset) aggregate — the join form re-plans the events
    # scan twice (no logical CSE) and adds a join exchange.
    uw = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id",
            F.min(F.date_trunc("day", F.col("ts"))).over(uw).alias("cohort_day"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q_snapshot_merge",
    oracle="""
    WITH latest AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order_date,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, l.o_custkey) AS custkey,
           c.c_name AS name,
           l.last_order_date,
           CAST(COALESCE(l.n_orders, 0) AS BIGINT) AS n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                WHEN l.o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS merge_case
    FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.o_custkey
    """,
)
def q_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join matrix completion (FULL OUTER) in its production costume:
    the SCD/CDC snapshot merge — current dimension rows full-outer-
    joined with aggregated change rows, each output tagged as matched,
    dimension-only (no activity), or change-only (orphan upsert). This
    is the batch twin of the streaming UpsertParquetSink's keyed merge.

    Scale: the change side pre-aggregates to one row per key before the
    join (partial aggregates collapse the fact volume), then one
    co-partitioned shuffle join on the key; with both sides bucketed by
    custkey the exchange disappears entirely (tests/test_bucketing.py
    proves the layout)."""
    c = load_table(spark, sf_dir, "customer")
    latest = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order_date"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    j = c.join(latest, c.c_custkey == latest.o_custkey, "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        F.col("c_name").alias("name"),
        "last_order_date",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("both")
        .alias("merge_case"),
    )
