"""Batch source/sink surface: schema-pinned readers, partitioned writes
with partition pruning, and the shared batch/stream JSON decode path."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_wikipedia_spark.schemas import EVENTS_SCHEMA, load_table
from flink_wikipedia_spark.sources import (
    read_csv,
    read_json_events,
    read_parquet,
    write_partitioned,
)
from tests.conftest import SF_SMOKE
from tests.test_core_ops import SAMPLE


def test_read_parquet_with_schema(spark):
    df = read_parquet(
        spark, f"{SF_SMOKE}/documents.parquet",
        load_table(spark, SF_SMOKE, "documents").schema,
    )
    assert df.count() == 500


def test_read_json_events_shares_stream_decode(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(SAMPLE + "\n" + "{broken\n")
    df = read_json_events(spark, str(p))
    rows = df.collect()
    ok = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(ok) == 1 and ok[0].domain == "en.wikipedia.org"
    assert len(bad) == 1  # malformed row survives as corrupt record


def test_read_csv_permissive(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("a,b\n1,x\nnot_a_number,y\n")
    df = read_csv(spark, str(p), "a long, b string")
    vals = {(r.a, r.b) for r in df.collect()}
    assert (1, "x") in vals and (None, "y") in vals


def test_write_partitioned_prunes(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "part")
    write_partitioned(ev, out, partition_cols=["event_type"], sort_cols=["ts"])
    back = spark.read.schema(EVENTS_SCHEMA).parquet(out)
    q = back.filter(F.col("event_type") == "purchase")
    # partition pruning: only the purchase directory is scanned
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == ev.filter("event_type = 'purchase'").count()
    assert "PartitionFilters: [isnotnull(event_type" in plan or "event_type=purchase" in plan


def test_schema_evolution_merge_and_pinned_read(spark, tmp_path):
    """Data-lake schema evolution: a corpus written over time gains a
    column. mergeSchema unifies the footers (old files null-fill); the
    production path — an explicit superset schema — reads BOTH vintages
    with no footer merge (at 100 TB, mergeSchema reads every file's
    footer on the driver; a pinned schema reads none)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    v1 = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    v1.write.parquet(str(tmp_path / "corpus" / "batch=1"))
    v2 = spark.range(100, 200).select(
        F.col("id").alias("doc_id"),
        F.lit("de").alias("lang"),
        F.lit("web").alias("source"),
    )
    v2.write.parquet(str(tmp_path / "corpus" / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "corpus")
    )
    assert set(merged.columns) >= {"doc_id", "lang", "source"}
    assert merged.count() == 200
    assert merged.filter(F.col("source").isNull()).count() == 100

    pinned = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
        ]
    )
    explicit = spark.read.schema(pinned).parquet(str(tmp_path / "corpus"))
    assert explicit.count() == 200
    assert explicit.filter(F.col("source") == "web").count() == 100
    assert explicit.filter(F.col("source").isNull()).count() == 100


def test_kafka_wire_format_decode_parity(spark):
    """The Kafka column contract (reference O1+O2,
    DataStreamJob.java:114-120): spark.read.format("kafka") yields
    exactly (key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int). This fixture
    reproduces that frame batch-side and proves decode_edit_events over
    its binary `value` produces the identical typed rows as the
    file-source string decode — no broker needed to pin the seam."""
    import datetime

    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from flink_wikipedia_spark.operators.core import decode_edit_events

    kafka_schema = StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
            StructField("timestampType", IntegerType()),
        ]
    )
    broker_ts = datetime.datetime(2023, 11, 27, 19, 19, 30)
    payloads = [SAMPLE, "{broken", SAMPLE.replace("en.wikipedia", "de.wikipedia")]
    kafka_rows = [
        (None, p.encode("utf-8"), "wikipedia-events", i % 2, i, broker_ts, 0)
        for i, p in enumerate(payloads)
    ]
    kafka_df = spark.createDataFrame(kafka_rows, kafka_schema)

    # the kafka_source projection: value-only, cast to string (the
    # reference's value-only deserialization, DataStreamJob.java:117)
    projected = kafka_df.select(F.col("value").cast("string").alias("value"))
    via_kafka = decode_edit_events(projected)

    file_df = spark.createDataFrame([(p,) for p in payloads], "value string")
    via_file = decode_edit_events(file_df)

    assert via_kafka.schema == via_file.schema
    k = sorted(via_kafka.collect(), key=lambda r: str(r))
    f = sorted(via_file.collect(), key=lambda r: str(r))
    assert k == f
    good = [r for r in k if r._corrupt_record is None]
    assert {r.domain for r in good} == {"en.wikipedia.org", "de.wikipedia.org"}
    # corrupt payload survives as a corrupt record, never a task failure
    assert sum(r._corrupt_record is not None for r in k) == 1


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """Format matrix: the events table written as ORC reads back
    row-identical (including native timestamps) under the same pinned
    schema — ORC shares parquet's columnar read posture."""
    from flink_wikipedia_spark.sources import read_orc, write_orc

    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_orc")
    write_orc(ev, out)
    back = read_orc(spark, out, EVENTS_SCHEMA)
    assert back.schema == ev.schema
    a = sorted(ev.collect(), key=lambda r: r.event_id)
    b = sorted(back.collect(), key=lambda r: r.event_id)
    assert a == b


def test_load_table_sniffs_both_parquet_time_units(spark, tmp_path):
    """The round-4 regression as a permanent fixture: the same events
    data written with MICROS and with NANOS timestamps must load to
    identical rows through load_table (footer sniffing picks the read
    path; the generator has shipped both units across rounds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_wikipedia_spark.schemas import load_table

    src = pq.read_table(f"{SF_SMOKE}/events.parquet").slice(0, 100)

    us_dir = tmp_path / "us_dir"
    ns_dir = tmp_path / "ns_dir"
    us_dir.mkdir()
    ns_dir.mkdir()
    pq.write_table(src, us_dir / "events.parquet")  # already timestamp[us]

    ns_schema = pa.schema(
        [
            f if f.name != "ts" else pa.field("ts", pa.timestamp("ns"))
            for f in src.schema
        ]
    )
    pq.write_table(
        src.cast(ns_schema), ns_dir / "events.parquet",
        coerce_timestamps=None, store_schema=False,
    )

    a = sorted(load_table(spark, str(us_dir), "events").collect(),
               key=lambda r: r.event_id)
    b = sorted(load_table(spark, str(ns_dir), "events").collect(),
               key=lambda r: r.event_id)
    assert a == b
    assert a[0].ts.year == 2024
