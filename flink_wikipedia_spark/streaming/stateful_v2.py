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
    Input: rows merge into the open session; a run of events whose
    successive gaps stay < gap closes intra-batch the moment a larger
    gap follows it ("gap" rows). The LAST run stays open with an
    event-time timer at end + gap; if the watermark passes that with no
    new input for the key, handleExpiredTimer emits it ("timer" rows) —
    the case batch sessionization can only discover on the next scan
    and classic GroupStateTimeout only on some later batch that happens
    to revisit the key.
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
        # one pass over the key's (few) batch rows; sessions are runs
        # separated by >= gap
        events = list(zip(ts_ms.tolist(), sizes[ts_ms.index].tolist()))

        prev = self._sess.get()
        if prev is not None:
            start, end, n, size = prev
            self._handle.deleteTimer(end + self._gap_ms)
            have = True
        else:
            start = end = n = size = 0
            have = False

        for t, sz in events:
            if not have:
                start, end, n, size = t, t, 1, int(sz)
                have = True
            elif t - end >= self._gap_ms:
                yield self._emit(key, start, end, n, size, "gap")
                start, end, n, size = t, t, 1, int(sz)
            else:
                # a late-but-within-watermark event can precede the
                # stored session; the span must cover it both ways
                start, end = min(start, t), max(end, t)
                n, size = n + 1, size + int(sz)
        self._sess.update((start, end, n, size))
        self._handle.registerTimer(end + self._gap_ms)

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
        if expired.getExpiryTimeInMs() < end + self._gap_ms:
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
    Batch twin: plans/queries_functions.q_sessionize (same gap
    semantics over the static table — windows over lag()); this
    operator exists for the infinite-stream case where the batch scan
    never ends and classic GroupStateTimeout revisits keys too lazily.
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
