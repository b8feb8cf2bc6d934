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


class FakeTimerValues:
    """TimerValues stand-in: the watermark as of BEFORE the current
    batch (matching the engine: late rows below it never reach the
    processor)."""

    def __init__(self, wm_ms):
        self.wm_ms = wm_ms

    def getCurrentWatermarkInMs(self):
        return self.wm_ms

    def getCurrentProcessingTimeInMs(self):
        return self.wm_ms


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


def _ms(s: str) -> int:
    import pandas as pd

    return int(pd.Timestamp(s).value // 10**6)


def test_session_processor_gap_split_and_timer():
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    gap_ms = 30_000
    p = _SessionGapProcessor(gap_ms)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    # batch 1 (no watermark yet): a run of 2, then a lone event 10 min
    # later — BOTH runs stay in state (nothing is provably immutable
    # until the watermark passes), each with its own timer
    out = list(p.handleInputRows(key, iter([_pdf([
        ("2024-01-01T10:00:00", 4),
        ("2024-01-01T10:00:10", 6),
        ("2024-01-01T10:10:00", 1),
    ])]), FakeTimerValues(0)))
    assert out == [] or all(len(df) == 0 for df in out)
    assert len(h.timers) == 2
    d1 = _ms("2024-01-01T10:00:10") + gap_ms + 1
    d2 = _ms("2024-01-01T10:10:00") + gap_ms + 1
    assert h.timers == {d1, d2}
    # batch 2, watermark now past the first run's deadline: fresh input
    # extends the SECOND run, and the first closes at input time ("gap")
    out = list(p.handleInputRows(
        key,
        iter([_pdf([("2024-01-01T10:10:20", 2)])]),
        FakeTimerValues(_ms("2024-01-01T10:05:00")),
    ))
    assert len(out) == 1 and out[0].iloc[0]["closed_by"] == "gap"
    assert out[0].iloc[0]["n_events"] == 2 and out[0].iloc[0]["total_size"] == 10
    assert h.timers == {_ms("2024-01-01T10:10:20") + gap_ms + 1}
    # watermark passes the remaining deadline with no new input →
    # timer closes the extended run
    deadline = next(iter(h.timers))
    out = list(p.handleExpiredTimer(key, None, FakeExpired(deadline)))
    assert out[0].iloc[0]["closed_by"] == "timer"
    assert out[0].iloc[0]["n_events"] == 2  # 10:10:00 + 10:10:20
    assert h.states["sessions"].get() is None
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
    assert h.states["sessions"].get() is not None


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
    # both runs stay open (watermark hasn't proven either immutable).
    # batch 1, domain b only: the watermark advances past both a-run
    # deadlines, so BOTH close via TIMER with no new a-input — the
    # capability under test.
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
        ("a.org", "2024-01-01 10:00:00", "2024-01-01 10:00:10", 2, 10, "timer"),
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
    # ADVICE r10: a late event preceding a stored session's start by
    # MORE than the gap must NOT merge into it (reachable whenever the
    # configured watermark exceeds the gap) — it becomes its own
    # session, closed by its own timer, leaving the newer one intact.
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    gap_ms = 30_000
    p = _SessionGapProcessor(gap_ms)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    t_new = _ms("2024-01-01T10:10:00")
    t_old = _ms("2024-01-01T10:00:00")
    list(p.handleInputRows(
        key, iter([_pdf([("2024-01-01T10:10:00", 1)])]), FakeTimerValues(0)))
    # late event 10 min EARLIER (legal: watermark is still at t_old)
    out = list(p.handleInputRows(
        key, iter([_pdf([("2024-01-01T10:00:00", 7)])]),
        FakeTimerValues(t_old)))
    assert out == [] or all(len(df) == 0 for df in out)
    # state holds TWO separate sessions with their own deadlines
    starts, ends, ns, sizes = h.states["sessions"].get()
    assert list(starts) == [t_old, t_new] and list(ns) == [1, 1]
    assert h.timers == {t_old + gap_ms + 1, t_new + gap_ms + 1}
    # the earlier session's timer closes ONLY it
    (out,) = list(p.handleExpiredTimer(
        key, None, FakeExpired(t_old + gap_ms + 1)))
    r = out.iloc[0]
    assert r["closed_by"] == "timer"
    assert str(r["session_start"]) == str(r["session_end"]) == "2024-01-01 10:00:00"
    assert r["n_events"] == 1 and r["total_size"] == 7
    # the newer session is untouched
    starts, ends, ns, sizes = h.states["sessions"].get()
    assert list(starts) == [t_new] and list(ns) == [1]


def test_late_event_rebridges_runs_split_in_an_earlier_batch():
    # the case eager closing can never get right (found by the r11
    # property sweep): batch 1 has events 0 s and 50 s (gap 30 s), a
    # legal late bridge at 25 s arrives in batch 2 — the batch twin
    # yields ONE session of 3 events, so must we
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    gap_ms = 30_000
    p = _SessionGapProcessor(gap_ms)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    out = list(p.handleInputRows(key, iter([_pdf([
        ("2024-01-01T10:00:00", 1),
        ("2024-01-01T10:00:50", 4),
    ])]), FakeTimerValues(0)))
    assert out == [] or all(len(df) == 0 for df in out)
    out = list(p.handleInputRows(
        key, iter([_pdf([("2024-01-01T10:00:25", 2)])]),
        FakeTimerValues(_ms("2024-01-01T10:00:25"))))
    assert out == [] or all(len(df) == 0 for df in out)
    deadline = _ms("2024-01-01T10:00:50") + gap_ms + 1
    assert h.timers == {deadline}
    (out,) = list(p.handleExpiredTimer(key, None, FakeExpired(deadline)))
    r = out.iloc[0]
    assert r["n_events"] == 3 and r["total_size"] == 7
    assert str(r["session_start"]) == "2024-01-01 10:00:00"
    assert str(r["session_end"]) == "2024-01-01 10:00:50"


def test_events_exactly_gap_apart_share_a_session():
    # batch-twin parity (ADVICE r10): q_sessionize splits on
    # tss - lag(tss) > 1800, strictly — exactly-gap-apart events share.
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _SessionGapProcessor,
    )

    gap_ms = 30_000
    p = _SessionGapProcessor(gap_ms)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    out = list(p.handleInputRows(key, iter([_pdf([
        ("2024-01-01T10:00:00.000", 1),
        ("2024-01-01T10:00:30.000", 2),  # exactly gap after → same session
        ("2024-01-01T10:01:00.001", 4),  # 1 ms past gap → new session
    ])]), FakeTimerValues(0)))
    assert out == [] or all(len(df) == 0 for df in out)
    starts, ends, ns, sizes = h.states["sessions"].get()
    assert list(ns) == [2, 1] and list(sizes) == [3, 4]
    assert ends[0] == _ms("2024-01-01T10:00:30")
    # cross-batch: an event exactly gap after a stored session's end
    # must merge too (the timer is registered at end + gap + 1 so the
    # watermark cannot close it first)
    out = list(p.handleInputRows(
        key, iter([_pdf([("2024-01-01T10:01:30.001", 8)])]),
        FakeTimerValues(0)))
    assert out == [] or all(len(df) == 0 for df in out)
    starts, ends, ns, sizes = h.states["sessions"].get()
    assert list(ns) == [2, 2]  # second session merged to 2 events


def test_bucketed_sessionize_e2e_matches_per_key(spark, tmp_path):
    """ENV-GATED e2e (self-healing when google.protobuf appears): the
    r12 bucketed sessionizer through a real transformWithState stream
    must emit the same session DATA multiset as the per-key operator
    (closed_by may differ — shared bucket timers; see
    _BucketedSessionProcessor)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state protocol is protobuf-based; "
        "environment-blocked here (no pip installs)",
    )
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        sessionize_with_timers_bucketed,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = time.time() - 600
    write_file(
        src,
        "000.json",
        [
            ev(1, domain="a.org", ts="2024-01-01T10:00:00Z", old=0, new=4),
            ev(2, domain="a.org", ts="2024-01-01T10:00:10Z", old=0, new=6),
            ev(3, domain="c.org", ts="2024-01-01T10:00:05Z", old=0, new=9),
            ev(4, domain="a.org", ts="2024-01-01T10:10:00Z", old=0, new=1),
        ],
        base,
    )
    write_file(
        src,
        "001.json",
        [ev(5, domain="b.org", ts="2024-01-01T11:00:00Z", old=0, new=2)],
        base + 10,
    )

    def run(op, ck, **kw):
        sink = MemorySink()
        q = (
            op(
                decode_edit_events(
                    file_source(spark, src, max_files_per_trigger=1)
                ),
                gap="30 seconds",
                **kw,
            )
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.domain, str(r.session_start), str(r.session_end),
             r.n_events, r.total_size)
            for r in sink.rows
        )

    with rocksdb_provider(spark):
        per_key = run(sessionize_with_timers, "ck_pk")
        bucketed = run(sessionize_with_timers_bucketed, "ck_bk", buckets=2)
    assert per_key == bucketed
    assert len(per_key) >= 3  # a-run, a-lone, c-run all closed by timers
