"""Optional REAL-endpoint integration tests (reference I/O parity:
``DataStreamJob.java:114-120`` Kafka source, ``:125-135`` Mongo sink).

The sandbox has no broker, no Mongo, and no connector jars, so these
skip with an explicit reason unless the matching env var points at a
live endpoint — the day one exists, the wire contract is EXECUTED here,
not just pinned by the option-map tests in test_streaming.py.

To run for real (env must be set before the first SparkSession of the
process — connector jars resolve at JVM start):

    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 \
    SPARK_GRAFT_MONGO_URI=mongodb://host:27017 \
    SPARK_GRAFT_JARS_PACKAGES="org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2,org.mongodb.spark:mongo-spark-connector_2.13:10.5.0" \
    python -m pytest tests/test_integration_endpoints.py -v
"""

from __future__ import annotations

import os
import uuid

import pytest

from tests.test_streaming import ev

KAFKA = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
MONGO = os.environ.get("SPARK_GRAFT_MONGO_URI")


@pytest.mark.skipif(
    not KAFKA,
    reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker in this environment)",
)
def test_kafka_roundtrip_matches_batch_flagship(spark, tmp_path):
    """Produce edit events to a fresh topic, run the flagship through
    the REAL Kafka wire path (earliest offsets, availableNow), and
    assert the windowed aggregate equals the same payloads decoded in
    batch — the stream/batch parity test_flagship_transform_* proves on
    the file source, here proven over the reference's actual transport."""
    from flink_wikipedia_spark.operators.core import decode_edit_events
    from flink_wikipedia_spark.streaming.pipeline import (
        build_flagship_stream,
        flagship_transform,
    )
    from flink_wikipedia_spark.streaming.sinks import MemorySink
    from flink_wikipedia_spark.streaming.sources import kafka_source

    topic = f"fws-it-{uuid.uuid4().hex[:8]}"
    lines = [ev(i, old=100, new=100 + 3 * i) for i in range(20)]
    (
        spark.createDataFrame([(line,) for line in lines], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic)
        .save()
    )
    src = kafka_source(spark, KAFKA, topic=topic, starting_offsets="earliest")
    sink = MemorySink()
    q = build_flagship_stream(spark, src, sink, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    batch = flagship_transform(
        decode_edit_events(
            spark.createDataFrame([(line,) for line in lines], "value string")
        )
    ).collect()
    want = {(r.domain, r.window_start): r.edit_size for r in batch}
    got = {(r.domain, r.window_start): r.edit_size for r in sink.rows}
    assert got == want


@pytest.mark.skipif(
    not MONGO,
    reason="SPARK_GRAFT_MONGO_URI not set (no Mongo in this environment)",
)
def test_mongo_sink_upsert_replay_invisible(spark):
    """MongoSink's operationType=replace + idFieldList contract against
    a REAL server: an at-least-once epoch replay must leave no
    duplicates and a later epoch must update in place — the idempotence
    the reference's sink lacks (SURVEY.md §4.2)."""
    from flink_wikipedia_spark.streaming.sinks import MongoSink

    coll = f"fws_it_{uuid.uuid4().hex[:8]}"
    sink = MongoSink(
        MONGO, database="fws_it", collection=coll, key_cols=["domain", "window_start"]
    )
    b1 = spark.createDataFrame(
        [("en", 100, 5), ("de", 100, 3)],
        "domain string, window_start long, edit_size long",
    )
    sink(b1, 0)
    sink(b1, 0)  # replay: same keys, must not duplicate
    b2 = spark.createDataFrame(
        [("en", 100, 9), ("fr", 200, 1)],
        "domain string, window_start long, edit_size long",
    )
    sink(b2, 1)  # update en@100 in place, insert fr@200
    got = (
        spark.read.format(MongoSink.FORMAT)
        .option("connection.uri", MONGO)
        .option("database", "fws_it")
        .option("collection", coll)
        .load()
        .select("domain", "window_start", "edit_size")
        .collect()
    )
    assert {(r.domain, r.window_start): r.edit_size for r in got} == {
        ("en", 100): 9,
        ("de", 100): 3,
        ("fr", 200): 1,
    }
