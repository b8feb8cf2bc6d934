"""Scalar-function breadth + reshaping operators: pivot, moment-based
statistics (deterministic stddev/correlation), string and date function
coverage, array ops — the long tail of SURVEY.md §2.2's "scalar fn
library" row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import DEC, dec_sum, sql_dec_sum_duckdb
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_having_active_users",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events,
           {sql_dec_sum_duckdb("value")} AS total_value
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > 50
    """,
)
def q_having_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING): heavy users only. Catalyst
    plans it as a filter above the final HashAggregate — it never sees
    pre-aggregated rows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .filter(F.col("n_events") > 50)
    )


@query(
    "q_union_all_actions",
    oracle="""
    SELECT kind, COUNT(*) AS n FROM (
        SELECT 'big_purchase' AS kind FROM events
        WHERE event_type = 'purchase' AND value > 150.0
        UNION ALL
        SELECT 'any_error' AS kind FROM events WHERE event_type = 'error'
    )
    GROUP BY kind
    """,
)
def q_union_all_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle, unlike q_setops_users'
    distinct union): both branches scan-prune independently and
    concatenate for free."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).select(
        F.lit("big_purchase").alias("kind")
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.lit("any_error").alias("kind")
    )
    return a.unionAll(b).groupBy("kind").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_median_value",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value
    FROM events GROUP BY event_type
    """,
)
def q_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90): both engines sort
    and linearly interpolate the same way, so values agree bit-for-bit
    (rounded 6dp for belt-and-braces). At 100 TB the exact form needs a
    per-group sort; approx_percentile (t-digest) is the sketch path —
    kept oracle-less like HLL."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
    )


@query(
    "q_collect_user_lists",
    oracle="""
    SELECT event_type,
           array_to_string(list_transform(list_sort(list(DISTINCT user_id)),
                                          x -> CAST(x AS VARCHAR)), ',') AS users
    FROM events
    WHERE user_id < 30
    GROUP BY event_type
    """,
)
def q_collect_user_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-list aggregation made deterministic: collect_set is
    unordered by contract, so sort before rendering — the only safe way
    to emit collected collections from a distributed engine."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return ev.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("user_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("users")
    )


@query(
    "q_pivot_user_event_values",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               sql_dec_sum_duckdb(
                   f"CASE WHEN event_type = '{t}' THEN value ELSE 0.0 END"
               ) + f" AS {t}"
               for t in EVENT_TYPES
           )}
    FROM events GROUP BY user_id
    """,
)
def q_pivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide reshape): per-user value totals, one column per
    event type. The values list is explicit, so Spark skips the extra
    distinct-values job and plans ONE aggregate pass — always give
    pivot its values at scale."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(dec_sum("value"))
    )
    # pivot leaves missing combinations null; the CASE oracle yields 0.0
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in EVENT_TYPES],
    )


@query(
    "q_value_moment_stats",
    oracle=f"""
    SELECT event_type, n,
           sum_v / n AS mean_value,
           sqrt((sum_v2 - sum_v * sum_v / n) / n) AS stddev_pop_value
    FROM (
        SELECT event_type,
               COUNT(*) AS n,
               {sql_dec_sum_duckdb("value")} AS sum_v,
               {sql_dec_sum_duckdb("value * value")} AS sum_v2
        FROM events GROUP BY event_type
    )
    """,
)
def q_value_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-based statistics: population stddev from exact decimal
    moments (Σx, Σx²) instead of the built-in streaming stddev — the
    pattern that makes second-order stats deterministic across engines,
    retries, and repartitioning (built-in stddev accumulates doubles in
    partition order; this doesn't)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sum_v"),
        dec_sum(F.col("value") * F.col("value")).alias("sum_v2"),
    )
    n = F.col("n")
    return base.select(
        "event_type",
        "n",
        (F.col("sum_v") / n).alias("mean_value"),
        F.sqrt((F.col("sum_v2") - F.col("sum_v") * F.col("sum_v") / n) / n).alias(
            "stddev_pop_value"
        ),
    )


@query(
    "q_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, metric, value FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
    )
    """,
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, the inverse of q_pivot): one row per
    (part, metric). Spark's unpivot/melt expands in the projection —
    no shuffle, output is metrics× the input rows."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@query(
    "q_hash_sample",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),1,15) AS BIGINT) % 100 < 10
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash — the corpus-pipeline
    sampling/sharding primitive (df.sample is seed-and-partitioning
    dependent and can never be cross-engine reproducible; hash-mod
    sampling is stable across engines, reruns, and repartitioning, and
    composes into train/val/test splits by range)."""
    from flink_wikipedia_spark.functions.compat import stable_token_hash

    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        stable_token_hash(F.col("event_id").cast("string")) % 100 < 10
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "q_posexplode_tokens",
    oracle="""
    SELECT doc_id, pos, token FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(text, ' '),
                      (t, i) -> struct_pack(pos := i, token := t))) AS s
        FROM documents WHERE doc_id < 50
    ), LATERAL (SELECT s.pos AS pos, s.token AS token)
    WHERE token <> ''
    """,
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode): tokens with their 1-based
    position — the ordinality-preserving flatten that n-gram and
    span-labeling pipelines need."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
        )
        .filter(F.col("token") != "")
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "token")
    )


@query(
    "q_rank_functions",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WHERE o_totalprice > 480000.0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-rank breadth: rank / dense_rank / percent_rank / ntile
    over one window spec — one shuffle on the partition key serves all
    four (Spark plans a single Window operator). percent_rank's
    (rank−1)/(n−1) division is integer-derived ⇒ deterministic."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000.0)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_string_functions",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_upper,
           length(text) AS text_len,
           substring(text, 1, 10) AS head10,
           replace(source, 'src', 'source-') AS source_renamed,
           concat(lang, ':', source) AS lang_source,
           CAST(contains(text, 'spark') AS INT) AS mentions_spark,
           ltrim(rtrim(concat(' ', lang, ' '))) AS trimmed
    FROM documents
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth in one pass: upper/length/substring/
    replace/concat/contains/trim — all codegen'd, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.length("text").cast("long").alias("text_len"),
        F.substring("text", 1, 10).alias("head10"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source-")).alias(
            "source_renamed"
        ),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.contains(F.col("text"), F.lit("spark")).cast("int").alias("mentions_spark"),
        F.ltrim(F.rtrim(F.concat(F.lit(" "), F.col("lang"), F.lit(" ")))).alias(
            "trimmed"
        ),
    )


@query(
    "q_ship_latency_histogram",
    oracle="""
    SELECT latency_days, COUNT(*) AS n_lines FROM (
        SELECT CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS INT) AS latency_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    GROUP BY latency_days
    """,
)
def q_ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across a join: order→ship latency in days,
    histogrammed. datediff is calendar-day subtraction on both engines
    (integer, deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.datediff("l_shipdate", "o_orderdate").alias("latency_days"))
        .groupBy("latency_days")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q_edit_distance_kernel",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(substring(a.text, 1, 20), substring(b.text, 1, 20)) AS INT) AS dist
    FROM documents a JOIN documents b ON a.doc_id < b.doc_id
    WHERE a.doc_id < 40 AND b.doc_id < 40
      AND levenshtein(substring(a.text, 1, 20), substring(b.text, 1, 20)) <= 8
    """,
)
def q_edit_distance_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching KERNEL (Levenshtein ≤ 8 on 20-char
    prefixes) over an explicitly-bounded candidate set (doc_id < 40) —
    the edit-distance dedup primitive. Both engines implement classic
    Levenshtein: integer, deterministic. At scale this only ever runs
    on sketch-generated candidates (like q_dedup_pipeline), never all
    pairs; the bound here stands in for that candidate feed."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.substring("text", 1, 20).alias("_ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.substring("text", 1, 20).alias("_tb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("_ta"), F.col("_tb")).alias("dist"),
        )
        .filter(F.col("dist") <= 8)
    )


@query(
    "q_orders_by_month",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           COUNT(*) AS n_orders,
           {sql_dec_sum_duckdb("o_totalprice")} AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function coverage: calendar grouping (year/month extraction
    — the batch analog of calendar-aligned windows)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "q_array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(round(CAST(embedding[1] AS DOUBLE), 6) AS DOUBLE) AS first_component,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
                 (a, b) -> a + b), 6) AS head8_sum,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(list_reverse(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE))))[1:3],
                                x -> x)), (a, b) -> a + b), 6) AS top3_sum
    FROM embeddings
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth over the embedding column: size, element
    access, slice + fold, sort-desc + top-slice fold — the higher-order
    toolkit (transform/aggregate/slice/sort_array) that keeps vector
    math JVM-side (E12)."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, b: a + b)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias(
            "first_component"
        ),
        F.round(fold(F.slice(as_double, 1, 8)), 6).alias("head8_sum"),
        F.round(
            fold(F.slice(F.reverse(F.array_sort(as_double)), 1, 3)), 6
        ).alias("top3_sum"),
    )


@query(
    "q_window_navigation",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_v,
           LAST_VALUE(value)  OVER w AS last_v,
           NTH_VALUE(value, 2) OVER w AS second_v,
           CUME_DIST() OVER (PARTITION BY user_id ORDER BY value) AS value_cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic navigation functions: each user's first/last/second
    event value over their full history (explicit unbounded ROWS frame —
    the SQL default frame stops at CURRENT ROW, which silently turns
    last_value into 'current value'), plus each value's cumulative
    distribution within the user. Ordering ties broken by event_id so
    both engines walk identical row orders; cume_dist depends only on
    the ordering KEY, so equal values get equal ranks deterministically."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("user_id").orderBy("value")
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
        F.cume_dist().over(wc).alias("value_cume"),
    )


@query(
    "q_regex_extract_props",
    oracle="""
    SELECT CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_value,
           COUNT(*) AS n
    FROM events
    WHERE props IS NOT NULL
    GROUP BY k_value
    """,
)
def q_regex_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction from semi-structured strings (the
    sibling of get_json_object for non-JSON formats): pull the numeric
    payload out of props and histogram it. Regex runs inside codegen
    on the JVM — no UDF."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    return (
        ev.select(F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("k_value"))
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_map_functions",
    oracle="""
    SELECT array_to_string(list_sort(json_keys(props)), ',') AS map_keys_csv,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_all_values,
           MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'k' AS BIGINT)) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY map_keys_csv, n_keys
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse the semi-structured props JSON
    into a real map<string,bigint> (from_json with a MapType target —
    schema-on-read for open key sets, vs the fixed-struct decode of
    q_json_extract), then exercise map_keys / size / element_at and a
    higher-order fold over map_values (aggregate), all JVM-side.

    The fold computes sum-of-ALL-values generically; the oracle, knowing
    this dataset's props carry the single key 'k', derives the same
    number from '$.k' — sum_k == sum_all_values doubles as a built-in
    consistency check between element_at and the fold. Multi-key fold
    correctness is pinned separately in tests/test_operators.py."""
    ev = load_table_spread(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    m = F.from_json("props", "map<string,bigint>")
    rows = ev.select(
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("map_keys_csv"),
        F.size(m).cast("long").alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.aggregate(F.map_values(m), F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "row_value_total"
        ),
    )
    return rows.groupBy("map_keys_csv", "n_keys").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k_value").alias("sum_k"),
        F.sum("row_value_total").alias("sum_all_values"),
        F.min("k_value").alias("min_k"),
        F.max("k_value").alias("max_k"),
    )


@query(
    "q_corr_quantity_price",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy)
           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM s
    """,
)
def q_corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group WITHOUT the built-in corr(): the
    built-in accumulates doubles in partition order (non-deterministic
    across engines AND across reruns); this moment-based form uses
    exact decimal sums, then a fixed sequence of double ops — sqrt is
    IEEE exact-rounded, so unlike ln/exp it is oracle-safe.

    Two determinism traps this query documents (found empirically):
    (1) squaring the raw DOUBLE first breaks the compat.py scale-6
    rule — at |p*p| ~ 1e10 the double's representation error reaches
    the 6th decimal and the double→decimal cast rounds differently
    per row across engines; so each factor is cast to its EXACT
    decimal(18,2) form first and the multiply happens in decimal.
    (2) the final decimal→double cast: DuckDB's native cast
    double-rounds (int / 10^scale), while Spark's BigDecimal path is
    correctly rounded — the oracle casts through VARCHAR, whose parse
    is correctly rounded in both engines."""
    li = load_table_spread(spark, sf_dir, "lineitem")
    D2 = "decimal(18,2)"
    q, p = F.col("l_quantity").cast(D2), F.col("l_extendedprice").cast(D2)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
    )


@query(
    "q_distribution_ranks",
    oracle="""
    SELECT event_id, event_type,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(value) OVER w AS type_min_value
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY value ASC NULLS LAST, event_id ASC)
    """,
)
def q_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth: the distribution-rank family — NTILE
    quartiles, PERCENT_RANK, CUME_DIST, FIRST_VALUE — over one ordered
    partition per event type. The event_id tiebreak makes the ordering
    total, so the peer-group-dependent functions (percent_rank,
    cume_dist) are deterministic and their integer-derived divisions
    bit-match the oracle. One shuffle on the partition key serves all
    four functions (same window spec ⇒ one Window operator)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    # Null placement pinned on BOTH engines: Spark ASC defaults to
    # NULLS FIRST, DuckDB to NULLS LAST — latent divergence if value
    # ever ships nulls (ADVICE r5). asc_nulls_last + NULLS LAST align.
    w = W.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("value").over(w).alias("type_min_value"),
    )


@query(
    "q_date_functions",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS hr,
           CAST(dayofweek(ts) AS INT) AS dow,
           ts + INTERVAL 7 DAY AS plus_week,
           date_trunc('month', ts) AS month_start,
           CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP) AS last_dom
    FROM events
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-library suite, date/time half (pairs with q_string/
    q_array/q_map_functions): calendar field extraction, interval
    arithmetic, month truncation, and end-of-month — the portable
    subset where Spark and DuckDB agree exactly (dow normalized to
    DuckDB's 0=Sunday; week-numbering and months_between are
    deliberately excluded — their definitions differ across engines).
    Map-only over the scan, whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("mo"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("hr"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("plus_week"),
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.last_day("ts").cast("timestamp").alias("last_dom"),
    )
