"""TPC-H-shaped relational queries beyond Q1/Q3/Q5 (which live in
queries_relational.py): selective scan aggregates, conditional
aggregation, correlated EXISTS, outer-join histograms, per-group scalar
subqueries, LIKE filters, grouping sets — the relational idioms any
engine user expects, adapted to the driver's star schema.

Broadcast policy (round 7): ``F.broadcast`` is forced ONLY for sides
that are bounded at ANY scale factor — nation/region (constant 25/5
rows), single-row scalar aggregates, and trained/capped artifacts.
Tables that grow linearly with the data (customer, part, supplier,
orders — 150M customers / 200M parts at TPC-H SF1000) carry NO hint:
the planner auto-broadcasts them from parquet size stats while they
fit under autoBroadcastJoinThreshold (64 MB here), and AQE converts a
shuffled join to broadcast at runtime when a filtered/derived side
turns out small — so the same plan text is broadcast-fast at sf0.1 and
shuffle-safe at SF1000. A forced hint on a linear table is a deferred
OOM: q_data_quality_audit's forced orders broadcast (150M rows) died
with "Not enough memory to build and broadcast" at sf100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import (
    dec_avg,
    dec_sum,
    dec_to_double_portable,
    sql_dec_sum_duckdb,
    sql_dec_to_double_duckdb,
)
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread


@query(
    "q_tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dec_sum_duckdb("l_extendedprice * l_discount")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + global
    aggregate. Every predicate reaches PushedFilters; on a
    shipdate-partitioned layout the scan prunes to one year of
    partitions before reading a byte."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_PROMO_CASE = (
    "CASE WHEN p.p_type = 'PROMO' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END"
)


@query(
    "q_tpch_q14_promo_share",
    oracle=f"""
    SELECT {sql_dec_sum_duckdb(_PROMO_CASE)} AS promo_revenue,
           {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) over a
    fact⋈dim join — part joins un-hinted (auto-broadcast while it fits,
    shuffled at SF1000 where 200M parts cannot), the CASE folds in the partial
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            dec_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias(
                "promo_revenue"
            ),
            dec_sum(rev).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q4_priority_with_big_lines",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_priority_with_big_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a left-semi
    join — the fact side is pre-filtered before the semi probe, and no
    lineitem column survives the join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45.0)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q13_order_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join + two-level aggregation (count per
    customer, then histogram of counts). The second aggregate's input is
    one row per customer — the heavy lifting is all in level one."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey,
               {sql_dec_sum_duckdb("l_quantity")} / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dec_sum_duckdb("l.l_extendedprice")} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'SMALL'
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group scalar subquery (avg quantity per
    part) consumed by the same fact table. Decorrelated to an aggregate
    + self-join on partkey; at scale both sides hash on the same key so
    AQE can plan a shuffled hash join with no extra exchange on the
    reused side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    part_avg = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        dec_avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == part_avg._pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dec_sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_like_filter_parts",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_parts,
           {sql_dec_sum_duckdb("p_retailprice")} AS total_price
    FROM part
    WHERE p_name LIKE '%wid%' OR p_name LIKE 'red%'
    GROUP BY p_brand
    """,
)
def q_like_filter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pattern matching (LIKE prefix + infix) — the Q9/Q13 idiom.
    Prefix LIKE pushes down as a StringStartsWith scan filter."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%wid%") | F.col("p_name").like("red%"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dec_sum("p_retailprice").alias("total_price"),
        )
    )


@query(
    "q_grouping_sets_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_dec_sum_duckdb("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube): three
    set layouts in one pass — Spark expands rows once, aggregates once.
    Expressed via spark.sql over registered views (the engine's SQL
    entry point, SURVEY.md §2.2 'SQL parser / catalog: free')."""
    load_table_spread(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               {sql_dec_sum_duckdb("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_window_share_of_segment",
    oracle=f"""
    SELECT o_orderkey, mktsegment, o_totalprice,
           o_totalprice
             / {sql_dec_to_double_duckdb("seg_sum")} AS segment_share
    FROM (
        SELECT o.o_orderkey, c.c_mktsegment AS mktsegment, o.o_totalprice,
               SUM(CAST(o.o_totalprice AS DECIMAL(28,6)))
                    OVER (PARTITION BY c.c_mktsegment) AS seg_sum
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > 450000.0
    )
    """,
)
def q_window_share_of_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ratio-to-group: each large order's share of its market
    segment's total — unbounded window sum (decimal-exact) feeding a
    per-row division."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.col("c_mktsegment").alias("mktsegment"), "o_totalprice"
    )
    from flink_wikipedia_spark.functions.compat import dec_to_double_portable

    w = Window.partitionBy("mktsegment")
    seg_sum = F.sum(F.col("o_totalprice").cast("decimal(28,6)")).over(w)
    return j.select(
        "o_orderkey",
        "mktsegment",
        "o_totalprice",
        # portable split conversion: a direct decimal->double cast
        # double-rounds once the scaled sum passes 2^53 (compat.py)
        (F.col("o_totalprice") / dec_to_double_portable(seg_sum)).alias(
            "segment_share"
        ),
    )


@query(
    "q_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most merchandise — 3-way
    fact⋈dim join, decimal-exact revenue per customer, global top-20
    (TakeOrderedAndProject; tie-broken on c_custkey so the limit is
    deterministic across engines)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dec_sum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_dec_sum_duckdb("l.l_quantity")} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(28,6))) > 240
    """,
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — aggregate-then-filter
    (HAVING on a decimal-exact quantity sum) with customer context. The
    original's IN-subquery over a grouped lineitem decorrelates to
    exactly this groupBy + filter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_qty"))
        .filter(F.col("_qty") > 240)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            dec_to_double_portable(F.col("_qty")).alias("total_qty"),
        )
    )


@query(
    "q_tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1  AND 15 AND l.l_quantity BETWEEN 1  AND 20)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 25 AND 45)
    """,
)
def q_tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands across the join — the classic test that an OR of
    mixed-table predicates still lets each side's local conjuncts push
    into its scan (Catalyst extracts p_brand/p_size and l_quantity
    ranges as data-source filters)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    band = (
        ((brand == "Brand#1") & size.between(1, 15) & qty.between(1, 20))
        | ((brand == "Brand#12") & size.between(10, 30) & qty.between(10, 30))
        | ((brand == "Brand#23") & size.between(20, 50) & qty.between(25, 45))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(dec_sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN customer c ON c.c_custkey   = o.o_custkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year — a 5-way
    star join where the same dimension (nation) enters under two roles
    (supplier's and customer's); nation stays broadcast, supplier and
    customer join un-hinted (auto-broadcast at small SF), so the only
    shuffle is the final group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dec_sum(rev).alias("volume"))
    )


@query(
    "q_tpch_q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each part profile —
    lineitem's distinct (part, supplier) pairs stand in for partsupp;
    negated predicates on the dim + COUNT(DISTINCT) over the join.

    No ``.distinct()`` on the (partkey, suppkey) pairs (r16, guide
    §2.4): COUNT(DISTINCT l_suppkey) already collapses duplicates, so
    pre-distincting the pairs only changed the plan, not the result —
    and it cost a FULL extra shuffle of every pair (the widest exchange
    in the query: 3 exchanges → 2, and the removed one carried
    |lineitem| rows at production scale; the countDistinct partial
    aggregate dedups (brand, type, size, suppkey) map-side BELOW its
    exchange instead). The oracle keeps its DISTINCT-pair form —
    result-identical by COUNT(DISTINCT) semantics, hash-checked."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    ps = li.select("l_partkey", "l_suppkey")
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact join + two-class conditional
    aggregation (service-level accounting: lines shipped >60 days after
    order, per priority).

    Scale: lineitem⋈orders is the one genuinely large join in the
    schema — deliberately NO broadcast hint; both sides shuffle on
    orderkey (or co-locate for free if both are bucketed by orderkey —
    tests/test_bucketing.py proves the zero-exchange layout). The
    conditional sum is a long, not a float — order-insensitive."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dec_sum_duckdb("l_extendedprice * (1 - l_discount)")} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: derived revenue view + scalar-subquery max —
    the top supplier(s) of a ship-date year.

    Scale: revenue collapses to |suppliers| rows before anything else
    touches it; the scalar max is a single-row broadcast (crossJoin) —
    never a global sort. Equality on total_rev is safe because both
    sides derive the double identically from exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q_tpch_q22_dormant_accounts",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {sql_dec_sum_duckdb("c_acctbal")} / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_custkey % 7 AS BIGINT) AS code,
           COUNT(*) AS n_custs,
           {sql_dec_sum_duckdb("c.c_acctbal")} AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q_tpch_q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (above-average
    balance) + NOT EXISTS (no order since 2000) + grouped rollup of the
    dormant-but-wealthy segment, keyed by a derived code.

    Scale: the global average is one broadcast row; NOT EXISTS is a
    left-anti join on custkey (no count-then-filter detour); everything
    else is the standard partial-aggregate shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                dec_to_double_portable(
                    F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
                )
                / F.count(F.lit(1))
            ).alias("_a")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(
            o.filter(
                F.col("o_orderdate")
                >= F.lit("2000-01-01 00:00:00").cast("timestamp")
            ),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy((F.col("c_custkey") % 7).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dec_sum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q_tpch_q9_nation_year_profit",
    oracle=f"""
    SELECT s.s_nationkey AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")}
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the profit rollup — fact⋈fact (lineitem⋈orders on
    orderkey, no hint) plus an un-hinted supplier join (auto-broadcast
    while small), grouped by
    (supplier nation, order year).

    Scale: the only large exchange is the orderkey join; the group-by
    key is tiny (|nations|×|years|), so the final aggregate collapses
    map-side. EXTRACT(YEAR) matches Spark's year() on both engines
    (UTC session pinned)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q21_sole_late_supplier",
    oracle="""
    WITH flagged AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
        FROM flagged GROUP BY l_orderkey
    )
    SELECT f.l_suppkey AS s_suppkey, COUNT(*) AS n_blocking_lines
    FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
    WHERE f.late = 1 AND p.n_supp > 1 AND p.n_late_supp = 1
    GROUP BY 1
    HAVING COUNT(*) >= 5
    """,
)
def q_tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: 'suppliers who kept orders waiting' — the
    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier) pair, expressed as one per-order aggregate instead of two
    correlated scans: count distinct suppliers and distinct late
    suppliers per order, keep late lines where the supplier was the
    sole offender on a multi-supplier order.

    Scale: the correlated-subquery formulation rescans lineitem twice
    per probe, and even the flagged⋈per-order join-back shape computes
    the fact join TWICE (the countDistinct exchange carries partial-agg
    rows, so Spark cannot reuse it for the probe side — at sf100 the
    duplicated lineitem+orders shuffle exhausted a 43 GB local disk).
    This shape shuffles each fact ONCE: the per-order distinct-supplier
    counts are collect_set windows directly over the flagged line rows
    (count-distinct-over-window spelled the one way Spark supports it),
    so when the orderkey join is sort-merge the window inherits both its
    partitioning AND its ordering — zero exchanges and zero sorts past
    the join itself; line counts per order stay small (TPC-H ≤ 7), so
    the window buffers are bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    w = Window.partitionBy("l_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("late") == 1, F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_blocking_lines"))
        .filter(F.col("n_blocking_lines") >= 5)
    )


@query(
    "q_tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT ps.l_partkey, ps.l_suppkey, ps.supplycost, s.s_name,
               s.s_acctbal, n.n_name
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal, supplycost
    FROM (
        SELECT p.p_partkey, eu.l_suppkey AS s_suppkey, eu.s_name, eu.n_name,
               eu.s_acctbal, eu.supplycost,
               MIN(eu.supplycost) OVER (PARTITION BY eu.l_partkey) AS min_cost
        FROM eu JOIN part p ON p.p_partkey = eu.l_partkey
        WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
    ) WHERE supplycost = min_cost
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest regional supplier for each part —
    the correlated MIN subquery expressed as an analytic window.
    partsupp is synthesized from lineitem's (part, supplier) pairs with
    MIN(l_extendedprice) as the supply-cost proxy (pure MIN, no
    arithmetic — bit-identical across engines).

    Scale: supplier⋈nation⋈region and the filtered part dim all
    broadcast; the only large exchanges are the partsupp group-by and
    the window repartition on l_partkey — a high-cardinality, evenly
    distributed key. The correlated-subquery formulation would rescan
    partsupp per probe; the window shape reads it once."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.join(eu_supp, ps.l_suppkey == eu_supp.s_suppkey)
        .join(p, ps.l_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "s_acctbal", "supplycost")
    )


_Q8_NATION_REV = (
    "CASE WHEN sn.n_name = 'NATION_2' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END"
)


@query(
    "q_tpch_q8_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {sql_dec_sum_duckdb(_Q8_NATION_REV)}
             / {sql_dec_sum_duckdb("l.l_extendedprice * (1 - l.l_discount)")} AS mkt_share,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a regional market per year
    — a 6-dim snowflake join with conditional-over-total aggregation.
    The share divides two decimal-exact double sums, so the quotient is
    bit-identical across engines.

    Scale: every dimension (part-filtered, customer→nation→region,
    supplier→nation and the constant dims broadcast; customer/part/
    supplier join un-hinted); lineitem⋈orders on orderkey is the one
    large exchange, and the date filter on orders cuts the build side
    before it. Group key is |years| — the final agg collapses
    map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_region = (
        c.join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .select("c_custkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(cust_region, o.o_custkey == F.col("c_custkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                dec_sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / dec_sum(vol)
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q11_important_stock",
    oracle=f"""
    WITH nation_lines AS (
        SELECT l.l_partkey, l.l_extendedprice * l.l_quantity AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_0'
    )
    SELECT l_partkey AS ps_partkey,
           {sql_dec_sum_duckdb("v")} AS value
    FROM nation_lines
    GROUP BY 1
    HAVING {sql_dec_sum_duckdb("v")} >
           0.002 * (SELECT {sql_dec_sum_duckdb("v")}
                    FROM nation_lines)
    """,
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's stock value — group-by HAVING against an uncorrelated
    scalar subquery. Stock value is proxied by extendedprice×quantity
    over the nation's lineitems.

    Determinism: BOTH the per-part values and the grand total are
    decimal sums over base rows (the total is never a re-sum of
    per-part doubles), so the 0.002×total threshold compares
    bit-identical doubles on both engines.

    Scale: supplier⋈nation (nation broadcast, product un-hinted)
    filters the fact scan; one
    shuffle on l_partkey; the scalar total rides the same scan as a
    broadcast single row — two passes over a pre-filtered fraction of
    lineitem, no giant exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    nation_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    v = F.col("l_extendedprice") * F.col("l_quantity")
    lines = li.join(nation_supp, li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", v.alias("v")
    )
    per_part = lines.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        dec_sum("v").alias("value")
    )
    total = lines.agg(dec_sum("v").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.002 * F.col("_total"))
        .select("ps_partkey", "value")
    )


@query(
    "q_tpch_q20_excess_stock_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 30
      )
    """,
)
def q_tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved serious volume of a part
    family in a year — the nested-IN pair expressed as chained
    semi-joins. The availqty threshold is a constant proxy (no partsupp
    table): half of a nominal availability of 60 units.

    Scale: the part-name filter semi-joins (un-hinted) and prunes
    the fact scan before the (suppkey, partkey) aggregate; the HAVING
    output collapses to a supplier-id set that semi-joins the supplier
    dim. No distinct needed — left-semi absorbs duplicates. The decimal
    quantity sum keeps the >30 cut bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    movers = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(p.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("_qty"))
        .filter(F.col("_qty") > 30)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
