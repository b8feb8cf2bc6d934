"""Custom stateful operators on the transformWithState API (Spark 4) —
the successor surface to ``applyInPandasWithState``.

Where ``stateful.py`` wraps the classic single-blob GroupState, this
module uses ``transformWithStateInPandas``'s StatefulProcessor: named,
individually-typed state variables, optional per-variable TTL, and —
the capability the classic API cannot express at all — **per-key
timers**, so a key can produce output when its watermark deadline
passes with NO new input for that key. The classic API's
GroupStateTimeout only revisits a key lazily and coarsely; a timer is
an exact, engine-scheduled callback.

Same reference lineage as stateful.py (the WindowFunction
generalization, ``DataStreamJob.java:93-108``); same scale posture:
state lives in the state store and must be O(1)-ish per key.

transformWithState is implemented only by the RocksDB state store
provider (Spark 4 limitation, SPARK-51070): every operator here checks
the session conf up front and raises a clear error instead of letting
the query die at start with an opaque provider exception — set
``SPARK_GRAFT_STATE_STORE=rocksdb`` (session.py wires the provider).

Deployment note: the feature's Python↔JVM state protocol needs
``google.protobuf`` in the PYTHON environment (the engine-side driver
worker imports StateMessage_pb2 at query start). Standard deployments
have it; this build sandbox does not, so end-to-end tests are
env-gated while processor logic is harness-tested
(tests/test_stateful_v2.py, SCALE.md §Real-connector smoke).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

RUNNING_TOTALS_SCHEMA = "domain string, n_edits long, total_edit_size long"

SESSION_SCHEMA = (
    "domain string, session_start timestamp, session_end timestamp, "
    "n_events long, total_size long, closed_by string"
)


def _require_rocksdb(df: DataFrame) -> None:
    provider = df.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDB" not in (provider or ""):
        raise ValueError(
            "transformWithState requires the RocksDB state store "
            "provider (Spark 4 limitation). Start the session with "
            "SPARK_GRAFT_STATE_STORE=rocksdb, or set "
            f"spark.sql.streaming.stateStore.providerClass={_ROCKSDB_PROVIDER}"
        )


class _RunningTotalsProcessor(StatefulProcessor):
    """ValueState twin of stateful._update_totals: two counters per key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, s long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._totals.get()
        n, s = prev if prev is not None else (0, 0)
        for pdf in rows:
            n += len(pdf)
            s += int((pdf["new_length"] - pdf["old_length"]).abs().sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"domain": [key[0]], "n_edits": [n], "total_edit_size": [s]}
        )

    def close(self) -> None:
        pass


def running_domain_totals_tws(decoded: DataFrame) -> DataFrame:
    """`stateful.running_domain_totals` on the modern API — identical
    output (one updated row per domain per batch, lifetime counters).
    Registered so the two stateful surfaces stay comparable; the classic
    operator remains the default (one fewer Spark-4-only dependency)."""
    _require_rocksdb(decoded)
    return (
        decoded.select("domain", "old_length", "new_length")
        .groupBy("domain")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


class _SessionGapProcessor(StatefulProcessor):
    """Event-time sessionization with timer-driven close.

    State: one open session per key (start_ms, end_ms, n, size).
    Each batch, the key's rows AND the stored open session are merged
    as sorted intervals: consecutive intervals whose gap is <= gap_ms
    coalesce; a strictly-larger gap closes the earlier interval
    intra-batch ("gap" rows). The boundary is strict-`>` split (events
    EXACTLY gap apart share a session) to match the batch twin
    q_sessionize's ``tss - lag(tss) > 1800`` — note this differs from
    F.session_window's exclusive-end semantics. The LAST interval stays
    open with an event-time timer at end + gap + 1 (the +1 keeps an
    event at exactly end + gap mergeable before the timer fires); if
    the watermark passes that with no new input for the key,
    handleExpiredTimer emits it ("timer" rows) — the case batch
    sessionization can only discover on the next scan and classic
    GroupStateTimeout only on some later batch that happens to revisit
    the key.

    Interval merging (not append-to-open) is what makes LATE rows
    correct under any watermark: a late event within the gap of the
    open session extends its span backwards; a late event MORE than
    gap earlier than the open session's start becomes its own,
    immediately-closed session instead of wrongly bridging the two
    (reachable whenever the configured watermark exceeds the gap).
    """

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sess", "start_ms long, end_ms long, n long, size long"
        )

    def _emit(self, key, start, end, n, size, closed_by) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "domain": [key[0]],
                "session_start": [pd.to_datetime(start, unit="ms")],
                "session_end": [pd.to_datetime(end, unit="ms")],
                "n_events": [n],
                "total_size": [size],
                "closed_by": [closed_by],
            }
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        ts_ms = (
            batch["ts"].astype("datetime64[ms]").astype("int64").sort_values()
        )
        # null lengths (corrupt-record decode) contribute 0 size, not a
        # NaN that would crash int() below
        sizes = (batch["new_length"] - batch["old_length"]).abs().fillna(0)
        # each event is a degenerate interval; the stored open session
        # (if any) joins the sorted merge as a real one — that is what
        # places a too-early late event BEFORE the open session instead
        # of appending it into it
        intervals = [
            (t, t, 1, int(sz))
            for t, sz in zip(ts_ms.tolist(), sizes[ts_ms.index].tolist())
        ]
        prev = self._sess.get()
        if prev is not None:
            self._handle.deleteTimer(prev[1] + self._gap_ms + 1)
            intervals.append(tuple(prev))
            intervals.sort(key=lambda iv: iv[0])

        start, end, n, size = intervals[0]
        for s2, e2, n2, sz2 in intervals[1:]:
            if s2 - end > self._gap_ms:  # strict: batch-twin parity
                yield self._emit(key, start, end, n, size, "gap")
                start, end, n, size = s2, e2, n2, sz2
            else:
                # max(): the open session can nest a shorter interval
                end = max(end, e2)
                n, size = n + n2, size + sz2
        self._sess.update((start, end, n, size))
        self._handle.registerTimer(end + self._gap_ms + 1)

    def handleExpiredTimer(
        self, key: Any, timer_values: TimerValues, expired: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        prev = self._sess.get()
        # a stale timer can outlive its session (deleteTimer is
        # best-effort when the expiry raced the watermark) — only a
        # timer matching the open session's deadline closes it
        if prev is None:
            return
        start, end, n, size = prev
        if expired.getExpiryTimeInMs() < end + self._gap_ms + 1:
            return
        self._sess.clear()
        yield self._emit(key, start, end, n, size, "timer")

    def close(self) -> None:
        pass


def sessionize_with_timers(
    decoded: DataFrame, gap: str = "30 minutes", watermark: str = "1 second"
) -> DataFrame:
    """Per-domain event-time sessions that CLOSE THEMSELVES when the
    watermark passes last-event + gap — no new input for the key needed.

    Output (update mode): one row per closed session with closed_by ∈
    {gap, timer} marking whether a later event or the timer closed it.
    Batch twin: plans/queries_relational.q_sessionize — same strict-`>`
    gap boundary (events exactly gap apart share a session; see
    _SessionGapProcessor) over the static table via windows over
    lag(); this operator exists for the infinite-stream case where the
    batch scan never ends and classic GroupStateTimeout revisits keys
    too lazily. Late events within the watermark merge correctly in
    both directions; see _SessionGapProcessor for the
    earlier-than-start-by-more-than-gap case.
    """
    _require_rocksdb(decoded)
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    return (
        decoded.select("domain", "ts", "old_length", "new_length")
        # a malformed timestamp decodes to null ts (see decode_edit_
        # events); sessions are undefined for it — drop JVM-side
        .filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("domain")
        .transformWithStateInPandas(
            statefulProcessor=_SessionGapProcessor(gap_ms),
            outputStructType=SESSION_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )
