"""Core reference-parity queries (SURVEY.md §2.1) over the driver
testdata, with the `events` table standing in for the Wikipedia edit
stream (event_type ↔ domain, value ↔ edit size) — the same operator
composition the reference hard-codes, run as batch so the DuckDB oracle
can check it.

Reference citations per query; streaming twins live in
``flink_wikipedia_spark/streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import dec_sum, ts_bucket, sql_dec_sum_duckdb
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread

WINDOW_SEC = 300  # the reference's 5-minute tumble (DataStreamJob.java:85)

# DuckDB fragment: 5-minute bucket start in epoch seconds.
_WS = f"CAST(floor(epoch(ts)/{WINDOW_SEC})*{WINDOW_SEC} AS BIGINT)"


@query(
    "q_windowed_edit_size",
    oracle=f"""
    SELECT domain,
           {sql_dec_sum_duckdb("abs_value")} AS edit_size,
           CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp(ws + {WINDOW_SEC}) AS TIMESTAMP) AS window_end
    FROM (
        SELECT event_type AS domain, ABS(value) AS abs_value, {_WS} AS ws
        FROM events
    )
    GROUP BY domain, ws
    """,
)
def q_windowed_edit_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — reference O7+O8+O9 (DataStreamJob.java:84-86, window fn
    :93-108): per (key, 5-minute tumbling window) sum of absolute sizes.

    One shuffle, partial→final HashAggregate; the grouping key includes
    the window bucket so state is bounded per (key, window). At 100 TB
    the map-side partial aggregate collapses each input partition to
    ≤ |keys×windows-touched| rows before the exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    ws = ts_bucket("ts", WINDOW_SEC)
    return (
        ev.select(
            F.col("event_type").alias("domain"),
            F.abs(F.col("value")).alias("abs_value"),
            ws.alias("window_start"),
        )
        .groupBy("domain", "window_start")
        .agg(dec_sum("abs_value").alias("edit_size"))
        .select(
            "domain",
            "edit_size",
            "window_start",
            (F.col("window_start") + F.expr(f"INTERVAL {WINDOW_SEC} SECONDS")).alias(
                "window_end"
            ),
        )
    )


@query(
    "q_keyby_agg_edit_size",
    oracle=f"""
    SELECT event_type AS domain,
           {sql_dec_sum_duckdb("ABS(value)")} AS edit_size,
           COUNT(*) AS n_edits
    FROM events
    GROUP BY event_type
    """,
)
def q_keyby_agg_edit_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O7+O9 keys-only (DataStreamJob.java:84,:97-100): total
    edit size per key, no time dimension. Tiny result (|keys| rows) —
    the canonical partial-aggregate win."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("domain"))
        .agg(
            dec_sum(F.abs(F.col("value"))).alias("edit_size"),
            F.count(F.lit(1)).alias("n_edits"),
        )
    )


@query(
    "q_salted_agg_edit_size",
    oracle=f"""
    SELECT event_type AS domain,
           {sql_dec_sum_duckdb("ABS(value)")} AS edit_size,
           COUNT(*) AS n_edits
    FROM events
    GROUP BY event_type
    """,
)
def q_salted_agg_edit_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted twin of q_keyby_agg_edit_size (SURVEY.md §4.3(4):
    en.wikipedia.org-style hot keys): two-phase groupBy over a
    deterministic row-hash salt. The oracle is the PLAIN group-by —
    proving the salted plan changes only the shuffle distribution,
    never the result (operators/skew.salted_sum)."""
    from flink_wikipedia_spark.operators.skew import salted_sum

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("domain"),
        F.abs(F.col("value")).alias("abs_value"),
    )
    out = salted_sum(
        ev,
        ["domain"],
        {"edit_size": F.col("abs_value").cast("decimal(28,6)")},
        count_alias="n_edits",
    )
    from flink_wikipedia_spark.functions.compat import dec_to_double_portable

    return out.select(
        "domain",
        dec_to_double_portable(F.col("edit_size")).alias("edit_size"),
        "n_edits",
    )


@query(
    "q_filter_events",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE LOWER(event_type) = 'purchase' AND value > 100.0
    """,
)
def q_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O5 (DataStreamJob.java:68-77): conjunctive
    case-insensitive equality predicate + comparison, as a scan-pushed
    filter. `.explain` shows it in PushedFilters — no row survives past
    the parquet reader that the predicate rejects."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.lower(F.col("event_type")) == "purchase") & (F.col("value") > 100.0)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "q_project",
    oracle="SELECT event_id, event_type, value FROM events",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O6 (DataStreamJob.java:78-83): early projection.
    ReadSchema in the physical plan carries exactly these 3 of 6
    columns — the scan never materializes the rest."""
    return load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")


@query(
    "q_json_extract",
    oracle=f"""
    SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n,
           {sql_dec_sum_duckdb("value")} AS total_value
    FROM events
    GROUP BY k
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O2 (JsonNodeDeserializationSchema.java:24-37): JSON
    field extraction — the reference's per-record Jackson walk becomes a
    codegen'd `get_json_object`. Null-safe where the reference NPEs on
    missing fields (SURVEY.md §1.3); try_cast so a non-numeric value
    nulls instead of throwing under ANSI (the NumberFormatException
    twin, JsonNodeDeserializationSchema.java:34-35)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").try_cast("long").alias("k"),
            F.col("value"),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value").alias("total_value"))
    )


@query(
    "q_to_json_roundtrip",
    oracle="""
    SELECT '{"event_id":' || event_id || ',"event_type":"' || event_type
           || '","user_id":' || user_id || '}' AS json
    FROM events
    WHERE event_id < 500
    """,
)
def q_to_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O10 (DataStreamJob.java:101-106, Document.toJson): row →
    JSON string. The oracle rebuilds Spark's exact `to_json` rendering
    with string concatenation (long/string fields only ⇒ stable text)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        F.to_json(F.struct("event_id", "event_type", "user_id")).alias("json")
    )


@query(
    "q_sliding_window_counts",
    oracle=f"""
    SELECT domain,
           CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
           CAST(to_timestamp(ws + {2 * WINDOW_SEC}) AS TIMESTAMP) AS window_end,
           COUNT(*) AS n_events,
           {sql_dec_sum_duckdb("ABS(value)")} AS total_value
    FROM (
        SELECT e.event_type AS domain, e.value,
               {_WS} - k.k * {WINDOW_SEC} AS ws
        FROM events e CROSS JOIN (VALUES (0), (1)) AS k(k)
    )
    GROUP BY domain, ws
    """,
)
def q_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in batch (10-min window, 5-min slide — the
    reference has tumbling only, DataStreamJob.java:85): each event
    belongs to exactly window_size/slide = 2 windows, expressed as an
    explode over 2 bucket offsets — a generate (no join, no extra
    shuffle) feeding the same single-exchange aggregate as the
    flagship. Streaming twin: streaming/pipeline.sliding_window_counts
    via window(ts, '10 minutes', '5 minutes')."""
    ev = load_table(spark, sf_dir, "events")
    base = (F.floor(F.unix_timestamp("ts") / WINDOW_SEC) * WINDOW_SEC).cast("long")
    return (
        ev.select(
            F.col("event_type").alias("domain"),
            F.abs(F.col("value")).alias("abs_value"),
            F.explode(
                F.array(base, base - WINDOW_SEC)
            ).alias("ws"),
        )
        .groupBy("domain", "ws")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("abs_value").alias("total_value"),
        )
        .select(
            "domain",
            F.timestamp_seconds("ws").alias("window_start"),
            F.timestamp_seconds(F.col("ws") + 2 * WINDOW_SEC).alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_edit_event_decode",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS id,
           event_type AS domain,
           user_id AS new_length,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_edit_event_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O2 full-schema decode path exercised end-to-end: build
    the reference's JSON payload shape (DataStreamJob.java:51-59) from
    events rows with to_json, then decode it back through the engine's
    permissive from_json (operators/core.decode_edit_events) — the
    number→string `id` coercion the reference does via asText()
    (JsonNodeDeserializationSchema.java:27) happens inside from_json."""
    from flink_wikipedia_spark.operators.core import decode_edit_events

    ev = load_table_spread(spark, sf_dir, "events")
    payload = ev.select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("domain"),
                F.lit("main namespace").alias("namespace"),
                F.lit("t").alias("title"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
                F.lit("u").alias("user_name"),
                F.lit("human").alias("user_type"),
                F.lit(0).alias("old_length"),
                F.col("user_id").alias("new_length"),
            )
        ).alias("value")
    )
    decoded = decode_edit_events(payload)
    return decoded.groupBy("id", "domain", "new_length").agg(
        F.count(F.lit(1)).alias("n")
    )
