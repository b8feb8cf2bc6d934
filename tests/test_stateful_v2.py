"""transformWithState operators (stateful_v2): modern-API running
totals twin + timer-driven sessionization.

Two layers, because the engine side is ENVIRONMENT-BLOCKED here:
transformWithState's Python<->JVM state protocol is protobuf-based and
this container has no `google.protobuf` (pip installs are off) — the
driver worker dies in StateMessage_pb2 import before user code runs.
So, mirroring the Kafka/Mongo convention (SCALE.md §Real-connector
smoke):

- processor LOGIC is tested for real against a fake handle/state
  harness (pure Python — sessions, timers, state transitions);
- END-TO-END queries are env-gated on `google.protobuf` and run
  wherever a standard deployment provides it.

transformWithState is also RocksDB-only (Spark 4); the e2e tests set
the provider conf around each query and restore it.
"""

from __future__ import annotations

import contextlib
import os
import time

import pytest

from flink_wikipedia_spark.operators.core import decode_edit_events
from flink_wikipedia_spark.streaming.sinks import MemorySink
from flink_wikipedia_spark.streaming.sources import file_source
from flink_wikipedia_spark.streaming.stateful import running_domain_totals
from flink_wikipedia_spark.streaming.stateful_v2 import (
    running_domain_totals_tws,
    sessionize_with_timers,
)
from tests.test_streaming import ev, write_file

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def rocksdb_provider(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)


def _run_update(spark, op, src, ck):
    sink = MemorySink()
    q = (
        op(decode_edit_events(file_source(spark, src, max_files_per_trigger=1)))
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sink


# ---------------------------------------------------------------- logic
# Fake handle/state harness: ValueState backed by a dict slot, timers a
# set. Drives the processors exactly as the engine does (init once,
# handleInputRows per key per batch, handleExpiredTimer on watermark).


class FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, t):
        self.v = tuple(t)

    def clear(self):
        self.v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


class FakeExpired:
    def __init__(self, ms):
        self.ms = ms

    def getExpiryTimeInMs(self):
        return self.ms


def _pdf(rows):
    import pandas as pd

    return pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows]),
            "old_length": [0] * len(rows),
            "new_length": [r[1] for r in rows],
        }
    )


def test_totals_processor_logic():
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _RunningTotalsProcessor,
    )

    p = _RunningTotalsProcessor()
    p.init(FakeHandle())
    out1 = list(p.handleInputRows(("a.org",), iter([_pdf(
        [("2024-01-01T10:00:00", 10), ("2024-01-01T10:00:05", 5)])]), None))
    out2 = list(p.handleInputRows(("a.org",), iter([_pdf(
        [("2024-01-01T10:01:00", 7)])]), None))
    assert out1[0].iloc[0].tolist() == ["a.org", 2, 15]
    assert out2[0].iloc[0].tolist() == ["a.org", 3, 22]


def test_session_processor_gap_split_and_timer():
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    gap_ms = 30_000
    p = _SessionGapProcessor(gap_ms)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    # batch 1: run of 2, then a lone event 10 min later → the run closes
    # intra-batch ("gap"), the lone event stays open with a timer
    out = list(p.handleInputRows(key, iter([_pdf([
        ("2024-01-01T10:00:00", 4),
        ("2024-01-01T10:00:10", 6),
        ("2024-01-01T10:10:00", 1),
    ])]), None))
    assert len(out) == 1 and out[0].iloc[0]["closed_by"] == "gap"
    assert out[0].iloc[0]["n_events"] == 2 and out[0].iloc[0]["total_size"] == 10
    open_deadline = next(iter(h.timers))
    # batch 2: the open session extends (gap not exceeded) — old timer
    # replaced, nothing emitted
    out = list(p.handleInputRows(key, iter([_pdf(
        [("2024-01-01T10:10:20", 2)])]), None))
    assert out == [] or all(len(df) == 0 for df in out)
    assert open_deadline not in h.timers and len(h.timers) == 1
    # watermark passes the deadline with no new input → timer closes it
    deadline = next(iter(h.timers))
    out = list(p.handleExpiredTimer(key, None, FakeExpired(deadline)))
    assert out[0].iloc[0]["closed_by"] == "timer"
    assert out[0].iloc[0]["n_events"] == 2  # 10:10:00 + 10:10:20
    assert h.states["sess"].get() is None
    # a stale timer after close is a no-op
    assert list(p.handleExpiredTimer(key, None, FakeExpired(deadline))) == []


def test_stale_timer_does_not_close_active_session():
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    p = _SessionGapProcessor(30_000)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    list(p.handleInputRows(key, iter([_pdf([("2024-01-01T10:00:00", 1)])]), None))
    first_deadline = next(iter(h.timers))
    list(p.handleInputRows(key, iter([_pdf([("2024-01-01T10:00:10", 1)])]), None))
    # a timer for the SUPERSEDED deadline must not close the extended
    # session (deleteTimer raced the watermark)
    assert list(p.handleExpiredTimer(key, None, FakeExpired(first_deadline))) == []
    assert h.states["sess"].get() is not None


# ------------------------------------------------------------------ e2e


def test_tws_requires_rocksdb(spark, tmp_path):
    # force a non-RocksDB provider for this scope: the suite itself may
    # legitimately run under SPARK_GRAFT_STATE_STORE=rocksdb
    src = str(tmp_path / "src")
    os.makedirs(src)
    write_file(src, "000.json", [ev(1)], time.time() - 600)
    decoded = decode_edit_events(file_source(spark, src))
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(
        _PROVIDER_KEY,
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    try:
        with pytest.raises(ValueError, match="RocksDB"):
            running_domain_totals_tws(decoded)
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)


def test_tws_totals_match_classic_operator(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol is protobuf-based; "
        "environment-blocked here (no pip installs)",
    )
    batches = [
        [ev(1, domain="a.org", old=0, new=10), ev(2, domain="b.org", old=0, new=5)],
        [ev(3, domain="a.org", old=7, new=0)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 600
    for i, lines in enumerate(batches):
        write_file(src, f"{i:03d}.json", lines, base + i * 10)

    def per_batch(sink):
        return [
            sorted((r.domain, r.n_edits, r.total_edit_size) for r in rows)
            for _, rows in sink.batches
            if rows
        ]

    with rocksdb_provider(spark):
        classic = per_batch(
            _run_update(spark, running_domain_totals, src, str(tmp_path / "ck1"))
        )
        modern = per_batch(
            _run_update(
                spark, running_domain_totals_tws, src, str(tmp_path / "ck2")
            )
        )
    assert classic == modern
    assert modern[-1] == [("a.org", 2, 17)]


def test_sessionize_gap_and_timer_close(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol is protobuf-based; "
        "environment-blocked here (no pip installs)",
    )
    # batch 0, domain a: a 2-event run then a lone event 10 min later —
    # the run closes intra-batch ("gap"); the lone event stays open.
    # batch 1, domain b only: the watermark advances past a's
    # last-event + gap, so a's open session closes via TIMER with no
    # new a-input — the capability under test.
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 600
    write_file(
        src,
        "000.json",
        [
            ev(1, domain="a.org", ts="2024-01-01T10:00:00Z", old=0, new=4),
            ev(2, domain="a.org", ts="2024-01-01T10:00:10Z", old=0, new=6),
            ev(3, domain="a.org", ts="2024-01-01T10:10:00Z", old=0, new=1),
        ],
        base,
    )
    write_file(
        src,
        "001.json",
        [ev(4, domain="b.org", ts="2024-01-01T11:00:00Z", old=0, new=2)],
        base + 10,
    )
    sink = MemorySink()
    with rocksdb_provider(spark):
        q = (
            sessionize_with_timers(
                decode_edit_events(
                    file_source(spark, src, max_files_per_trigger=1)
                ),
                gap="30 seconds",
            )
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    got = sorted(
        (r.domain, str(r.session_start), str(r.session_end), r.n_events,
         r.total_size, r.closed_by)
        for r in sink.rows
    )
    assert got == [
        ("a.org", "2024-01-01 10:00:00", "2024-01-01 10:00:10", 2, 10, "gap"),
        ("a.org", "2024-01-01 10:10:00", "2024-01-01 10:10:00", 1, 1, "timer"),
    ]


def test_late_event_extends_session_span_backwards():
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    p = _SessionGapProcessor(30_000)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    list(p.handleInputRows(key, iter([_pdf([("2024-01-01T10:00:10", 1)])]), None))
    # a late event 5 s EARLIER, still within the gap of the open session
    out = list(p.handleInputRows(key, iter([_pdf(
        [("2024-01-01T10:00:05", 2)])]), None))
    assert out == [] or all(len(df) == 0 for df in out)
    deadline = next(iter(h.timers))
    (out,) = list(p.handleExpiredTimer(key, None, FakeExpired(deadline)))
    r = out.iloc[0]
    assert str(r["session_start"]) == "2024-01-01 10:00:05"
    assert str(r["session_end"]) == "2024-01-01 10:00:10"
    assert r["n_events"] == 2 and r["total_size"] == 3


def test_too_early_late_event_is_its_own_session_not_a_bridge():
    # ADVICE r10: a late event preceding the open session's start by
    # MORE than the gap must NOT merge into it (reachable whenever the
    # configured watermark exceeds the gap) — it is its own session,
    # already closed by the gap to the open one.
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    p = _SessionGapProcessor(30_000)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    list(p.handleInputRows(key, iter([_pdf([("2024-01-01T10:10:00", 1)])]), None))
    # late event 10 min EARLIER than the open session's start
    out = list(p.handleInputRows(key, iter([_pdf(
        [("2024-01-01T10:00:00", 7)])]), None))
    assert len(out) == 1
    r = out[0].iloc[0]
    assert r["closed_by"] == "gap"
    assert str(r["session_start"]) == str(r["session_end"]) == "2024-01-01 10:00:00"
    assert r["n_events"] == 1 and r["total_size"] == 7
    # the open session is untouched: still 1 event, original span
    assert h.states["sess"].get() == (
        1704103800000, 1704103800000, 1, 1  # 2024-01-01T10:10:00 in ms
    )
    # and its timer still closes it at the original deadline (+1 for
    # the inclusive-gap boundary)
    (out,) = list(p.handleExpiredTimer(
        key, None, FakeExpired(1704103800000 + 30_000 + 1)))
    assert out.iloc[0]["closed_by"] == "timer" and out.iloc[0]["n_events"] == 1


def test_events_exactly_gap_apart_share_a_session():
    # batch-twin parity (ADVICE r10): q_sessionize splits on
    # tss - lag(tss) > 1800, strictly — exactly-gap-apart events share.
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    p = _SessionGapProcessor(30_000)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    out = list(p.handleInputRows(key, iter([_pdf([
        ("2024-01-01T10:00:00.000", 1),
        ("2024-01-01T10:00:30.000", 2),  # exactly gap after → same session
        ("2024-01-01T10:01:00.001", 4),  # 1 ms past gap → new session
    ])]), None))
    assert len(out) == 1
    r = out[0].iloc[0]
    assert r["closed_by"] == "gap" and r["n_events"] == 2 and r["total_size"] == 3
    assert str(r["session_end"]) == "2024-01-01 10:00:30"
    # cross-batch: an event exactly gap after the OPEN session's end
    # must merge too (the timer is registered at end + gap + 1 so the
    # watermark cannot close it first)
    out = list(p.handleInputRows(key, iter([_pdf(
        [("2024-01-01T10:01:30.001", 8)])]), None))
    assert out == [] or all(len(df) == 0 for df in out)
    assert h.states["sess"].get()[2] == 2  # n_events merged to 2
