"""Custom Python DataSource (`wikipedia_sim`): batch partitioned reads,
deterministic regeneration, streaming offsets that resume from the
checkpoint — the replayable-source property the reference's
latest-offsets Kafka config lacks (SURVEY.md §4.2)."""

from __future__ import annotations

import os

import pytest

from flink_wikipedia_spark.operators.core import decode_edit_events, filter_human_main
from flink_wikipedia_spark.sources.wikipedia_sim import event_json, register
from flink_wikipedia_spark.streaming.sinks import MemorySink


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def test_batch_read_is_deterministic_and_partitioned(spark):
    df = spark.read.format("wikipedia_sim").option("rows", 400).load()
    assert df.count() == 400
    assert df.rdd.getNumPartitions() > 1  # range-partitioned generation
    a = sorted(r.value for r in df.collect())
    b = sorted(
        r.value
        for r in spark.read.format("wikipedia_sim").option("rows", 400).load().collect()
    )
    assert a == b  # same options ⇒ identical events


def test_batch_decodes_through_the_standard_pipeline(spark):
    df = spark.read.format("wikipedia_sim").option("rows", 300).load()
    dec = decode_edit_events(df)
    assert dec.filter("_corrupt_record IS NOT NULL").count() == 0
    kept = filter_human_main(dec)
    assert 0 < kept.count() < 300  # bots/talk filtered, humans remain


def test_stream_resumes_from_checkpoint_offset(spark, tmp_path):
    """availableNow drains one micro-batch per run; the SECOND run must
    continue from the committed offset, not restart at 0."""

    def run_once():
        sink = MemorySink()
        q = (
            spark.readStream.format("wikipedia_sim")
            .option("rowsPerBatch", "100")
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r.value for r in sink.rows]

    first = run_once()
    second = run_once()
    assert first[0] == event_json(0)
    assert second[0] == event_json(len(first))  # resumed, not replayed
    assert set(first).isdisjoint(second)
