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


def _split_clock_drift(rows, n_batches_events):
    """Max event-time drift (seconds) between split clocks, from the
    emitted JSON timestamps."""
    import datetime
    import json as _json

    latest = {}
    for v in rows:
        e = _json.loads(v)
        ts = datetime.datetime.strptime(e["timestamp"], "%Y-%m-%dT%H:%M:%SZ")
        # split identity: ids are k * max_rows + i + 1_000_000
        split = (e["id"] - 1_000_000) // n_batches_events
        latest[split] = max(latest.get(split, ts), ts)
    vals = sorted(latest.values())
    return (vals[-1] - vals[0]).total_seconds(), latest


def _run_sim_stream(spark, tmp_path, ck_name, **opts):
    sink = MemorySink()
    reader = spark.readStream.format("wikipedia_sim")
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    q = (
        reader.load()
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / ck_name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return [r.value for r in sink.rows]


def test_watermark_alignment_caps_split_drift(spark, tmp_path):
    """O4 twin (DataStreamJob.java:64 withWatermarkAlignment, 30 s cap):
    with splits advancing 10:1 and maxDriftSeconds set, the fast split
    must PAUSE — its clock never runs more than the budget past the
    slow split. Without alignment the same rates drift unboundedly."""
    MAX_ROWS = 1_000_000
    common = dict(
        rowsPerBatch=110, splits=2, splitRates="10,1", maxRows=MAX_ROWS
    )

    aligned = _run_sim_stream(
        spark, tmp_path, "ck-aligned", maxDriftSeconds=70, **common
    )
    drift, latest = _split_clock_drift(aligned, MAX_ROWS)
    assert len(latest) == 2  # both splits emitted
    assert drift <= 70, f"aligned drift {drift}s exceeds 70s budget"

    free = _run_sim_stream(spark, tmp_path, "ck-free", **common)
    drift_free, _ = _split_clock_drift(free, MAX_ROWS)
    assert drift_free > 70, (
        f"unaligned control should drift past the budget (got {drift_free}s)"
    )


def test_aligned_stream_resumes_from_per_split_offsets(spark, tmp_path):
    """Per-split offsets survive the checkpoint: a second availableNow
    run continues every split forward, replaying nothing."""
    opts = dict(
        rowsPerBatch=40, splits=2, splitRates="3,1",
        maxDriftSeconds=700, maxRows=1_000_000,
    )
    first = _run_sim_stream(spark, tmp_path, "ck-resume", **opts)
    second = _run_sim_stream(spark, tmp_path, "ck-resume", **opts)
    assert first and second
    assert set(first).isdisjoint(second)


def test_aligned_source_feeds_flagship_windows(spark, tmp_path):
    """O1+O3+O4 integration: the aligned multi-split source drives the
    full flagship pipeline — windows aggregate correctly across split
    clocks, and alignment keeps both splits contributing to overlapping
    event-time ranges (a runaway fast split would leave the slow
    split's windows unmergeable until much later)."""
    from flink_wikipedia_spark.streaming.pipeline import build_flagship_stream

    sink = MemorySink()

    def run_once():
        reader = spark.readStream.format("wikipedia_sim")
        for k, v in dict(
            rowsPerBatch=120, splits=2, splitRates="8,1",
            maxDriftSeconds=140, maxRows=1_000_000,
        ).items():
            reader = reader.option(k, str(v))
        q = build_flagship_stream(
            spark, reader.load(), sink, str(tmp_path / "ck"),
            watermark="1 second", window_duration="1 minute",
        )
        q.awaitTermination(120)

    # availableNow drains ONE micro-batch of this source per run; append
    # mode finalizes a window only after a later batch advances the
    # watermark — so run twice on the same checkpoint.
    run_once()
    run_once()
    rows = sink.rows
    assert rows, "aligned source produced no finalized windows"
    # all windows are 1-minute event-time buckets from the sim clock
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 60
        assert r.edit_size >= 0
