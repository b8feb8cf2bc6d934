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
    """Event-time sessionization, watermark-correct for ANY watermark.

    State: ALL not-yet-expired sessions per key, as four parallel
    arrays (starts, ends, ns, sizes). Each batch, the key's rows and
    every stored session are merged as sorted intervals: consecutive
    intervals whose gap is <= gap_ms coalesce. The boundary is
    strict-`>` split (events EXACTLY gap apart share a session) to
    match the batch twin q_sessionize's ``tss - lag(tss) > 1800`` —
    note this differs from F.session_window's exclusive-end semantics.

    A merged run is emitted at input time ("gap" rows) ONLY when
    ``end + gap < watermark`` — the engine guarantees no future row
    below the watermark, so nothing can ever merge into it again.
    Every other run stays in state with an event-time timer at
    ``end + gap + 1`` (the +1 keeps an event at exactly end + gap
    mergeable before the timer fires); when the watermark passes a
    deadline with no new input for the key, handleExpiredTimer emits
    the expired runs ("timer" rows) — the case batch sessionization
    can only discover on the next scan and classic GroupStateTimeout
    only on some later batch that happens to revisit the key.

    Why a LIST of open sessions instead of one open + eager closes:
    eager intra-batch closing diverges from the batch twin whenever a
    still-watermark-legal late row re-bridges a run that a later row
    in an earlier batch had already "closed" (events 0 and 2·gap in
    batch 1, bridge at 0.8·gap arriving in batch 2: the twin yields
    ONE session, eager closing can never un-emit). Keeping every run
    until the WATERMARK proves it immutable makes the operator
    multiset-identical to the batch twin under any watermark/gap
    combination — property-pinned in
    tests/test_session_processor_properties.py. State stays bounded:
    runs live only until watermark passes end + gap, so the array
    holds O(watermark_delay / gap + 1) sessions per key.

    CHECKPOINT COMPATIBILITY (ADVICE r11): round 11 renamed/re-typed
    this processor's state variable (r10's single-open-session 'sess'
    struct → the 'sessions' four-array list) and shifted timer
    deadlines by +1. A checkpointed sessionize query written by the
    r10 processor must be restarted from a FRESH checkpoint: resuming
    it here would start with empty 'sessions' state, orphan the old
    'sess' value, and let old-deadline timers fire as no-ops, silently
    losing every in-flight session. No automatic migration is provided
    — the state store gives a processor no enumeration of legacy
    variables to convert reliably, and a half-migrated key is worse
    than a loud operational rule: NEW STATE SCHEMA ⇒ NEW CHECKPOINT.
    """

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sessions",
            "starts array<long>, ends array<long>, "
            "ns array<long>, sizes array<long>",
        )

    def _stored(self) -> list[tuple[int, int, int, int]]:
        v = self._sess.get()
        return [] if v is None else [tuple(x) for x in zip(*v)]

    def _store(self, sessions: list[tuple[int, int, int, int]]) -> None:
        if sessions:
            self._sess.update(tuple(list(col) for col in zip(*sessions)))
        else:
            self._sess.clear()

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
        # watermark BEFORE this batch — rows below it were already
        # dropped by the engine, which is exactly what makes the
        # end + gap < wm close sound. The fake test harness passes
        # None for "no watermark yet" (everything closes via timers).
        wm = (
            timer_values.getCurrentWatermarkInMs()
            if timer_values is not None
            else 0
        )
        batch = pd.concat(list(rows), ignore_index=True)
        ts_ms = (
            batch["ts"].astype("datetime64[ms]").astype("int64").sort_values()
        )
        # null lengths (corrupt-record decode) contribute 0 size, not a
        # NaN that would crash int() below
        sizes = (batch["new_length"] - batch["old_length"]).abs().fillna(0)
        # each event is a degenerate interval; every stored session
        # joins the sorted merge as a real one — a late row lands
        # between/inside runs instead of being appended to the newest
        intervals = [
            (t, t, 1, int(sz))
            for t, sz in zip(ts_ms.tolist(), sizes[ts_ms.index].tolist())
        ]
        stored = self._stored()
        for _, end, _, _ in stored:
            self._handle.deleteTimer(end + self._gap_ms + 1)
        intervals.extend(stored)
        intervals.sort(key=lambda iv: (iv[0], iv[1]))

        runs = []
        start, end, n, size = intervals[0]
        for s2, e2, n2, sz2 in intervals[1:]:
            if s2 - end > self._gap_ms:  # strict: batch-twin parity
                runs.append((start, end, n, size))
                start, end, n, size = s2, e2, n2, sz2
            else:
                # max(): a stored run can nest a shorter interval
                end = max(end, e2)
                n, size = n + n2, size + sz2
        runs.append((start, end, n, size))

        keep: list[tuple[int, int, int, int]] = []
        for run in runs:
            if run[1] + self._gap_ms < wm:
                yield self._emit(key, *run, "gap")
            else:
                keep.append(run)
                self._handle.registerTimer(run[1] + self._gap_ms + 1)
        self._store(keep)

    def handleExpiredTimer(
        self, key: Any, timer_values: TimerValues, expired: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # emit every stored run whose deadline the watermark has
        # passed; a stale timer (deleted best-effort after a merge)
        # that matches no run's deadline is a no-op
        expiry = expired.getExpiryTimeInMs()
        keep = []
        for run in self._stored():
            if run[1] + self._gap_ms + 1 <= expiry:
                yield self._emit(key, *run, "timer")
            else:
                keep.append(run)
        self._store(keep)

    def close(self) -> None:
        pass


def sessionize_with_timers(
    decoded: DataFrame, gap: str = "30 minutes", watermark: str = "1 second"
) -> DataFrame:
    """Per-domain event-time sessions that CLOSE THEMSELVES when the
    watermark passes last-event + gap — no new input for the key needed.

    Output (update mode): one row per closed session with closed_by ∈
    {gap, timer} marking whether fresh input (with the watermark
    already past the run's deadline) or the timer itself closed it.
    Batch twin: plans/queries_relational.q_sessionize — same strict-`>`
    gap boundary (events exactly gap apart share a session; see
    _SessionGapProcessor) over the static table via windows over
    lag(); this operator exists for the infinite-stream case where the
    batch scan never ends and classic GroupStateTimeout revisits keys
    too lazily. Sessions are closed only once the watermark proves
    them immutable, so the output multiset equals the batch twin's for
    ANY watermark/gap combination (property-pinned) — over the rows
    the watermark ADMITS: rows later than the configured delay are
    dropped by the engine before any stateful operator sees them,
    standard Structured Streaming semantics. Late rows within the
    watermark merge correctly in any position — extending spans
    backwards, re-bridging runs, or forming their own session.
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


class _BucketedSessionProcessor(StatefulProcessor):
    """_SessionGapProcessor with hash-bucketed state: one grouping key
    per BUCKET, state = every stored run of every domain in the bucket
    as five parallel arrays (domains, starts, ends, ns, sizes).

    Semantics equal the per-key processor for ANY assignment of
    domains to buckets — FULL equality including the closed_by label
    (property-pinned in tests/test_session_bucketing_properties.py,
    upgraded r13 from data-multiset-only). Timers are per bucket and
    shared deadlines cannot be deleted per domain (deleting deadline D
    for one domain's merged run would cancel another domain's live
    timer at the same D), so stale timers are left registered — but a
    stale firing is label-BENIGN, not just watermark-sound: a run is
    sweepable at a stale expiry T only if its own deadline ≤ T ≤
    watermark, and every stored run holds a live timer at exactly its
    own deadline (registered at input time, never deleted here), so
    its own timer fires in the SAME batch with the SAME 'timer' label;
    input-time 'gap' emission checks the identical deadline<watermark
    condition at the identical watermark in both layouts. Stale timers
    therefore only ever fire as no-ops or duplicate sweeps of runs
    already emitted/kept by the same batch's own-deadline firing.

    Per-domain merge work is unchanged (merge-intervals over that
    domain's rows + stored runs); what bucketing amortizes is the
    per-GROUP overhead — Arrow round trips and state-store point
    lookups, the measured bottleneck at sf100 for the totals twin
    (stateful.running_domain_totals_bucketed has the sweep numbers).
    Only domains present in the batch are merged at input time; other
    domains' runs sit untouched in the bucket row until a timer fires.
    """

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "bucket_sessions",
            "domains array<string>, starts array<long>, ends array<long>, "
            "ns array<long>, sizes array<long>",
        )

    def _stored(self) -> dict:
        v = self._sess.get()
        if v is None:
            return {}
        out: dict = {}
        for d, s, e, n, sz in zip(*v):
            out.setdefault(d, []).append((s, e, n, sz))
        return out

    def _store(self, by_domain: dict) -> None:
        flat = [
            (d, *run) for d, runs in by_domain.items() for run in runs
        ]
        if flat:
            self._sess.update(tuple(list(col) for col in zip(*flat)))
        else:
            self._sess.clear()

    def _emit(self, domain, start, end, n, size, closed_by) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "domain": [domain],
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
        wm = (
            timer_values.getCurrentWatermarkInMs()
            if timer_values is not None
            else 0
        )
        batch = pd.concat(list(rows), ignore_index=True)
        ts_all = batch["ts"].astype("datetime64[ms]").astype("int64")
        sizes_all = (batch["new_length"] - batch["old_length"]).abs().fillna(0)
        stored = self._stored()
        # dropna=False: a null domain is its own session key, exactly
        # like the per-key operator's null grouping key
        for domain, idx in batch.groupby(
            "domain", dropna=False
        ).indices.items():
            if pd.isna(domain):
                domain = None
            intervals = [
                (int(t), int(t), 1, int(sz))
                for t, sz in sorted(
                    zip(ts_all.iloc[idx].tolist(), sizes_all.iloc[idx].tolist())
                )
            ]
            intervals.extend(stored.pop(domain, []))
            intervals.sort(key=lambda iv: (iv[0], iv[1]))
            runs = []
            start, end, n, size = intervals[0]
            for s2, e2, n2, sz2 in intervals[1:]:
                if s2 - end > self._gap_ms:  # strict: batch-twin parity
                    runs.append((start, end, n, size))
                    start, end, n, size = s2, e2, n2, sz2
                else:
                    end = max(end, e2)
                    n, size = n + n2, size + sz2
            runs.append((start, end, n, size))
            keep = []
            for run in runs:
                if run[1] + self._gap_ms < wm:
                    yield self._emit(domain, *run, "gap")
                else:
                    keep.append(run)
                    self._handle.registerTimer(run[1] + self._gap_ms + 1)
            if keep:
                stored[domain] = keep
        self._store(stored)

    def handleExpiredTimer(
        self, key: Any, timer_values: TimerValues, expired: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # the deadline belongs to the BUCKET: sweep every domain's runs
        # past it; stale timers (superseded by merges) are no-ops
        expiry = expired.getExpiryTimeInMs()
        stored = self._stored()
        keep: dict = {}
        for domain, runs in stored.items():
            for run in runs:
                if run[1] + self._gap_ms + 1 <= expiry:
                    yield self._emit(domain, *run, "timer")
                else:
                    keep.setdefault(domain, []).append(run)
        self._store(keep)

    def close(self) -> None:
        pass


def sessionize_with_timers_bucketed(
    decoded: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 second",
    buckets: int | None = None,
    est_keys: int | None = None,
) -> DataFrame:
    """``sessionize_with_timers`` with hash-bucketed state — identical
    output, session data AND closed_by labels (property-pinned; see
    _BucketedSessionProcessor) but grouped on ``hash(domain) %
    buckets``, the same amortization move as
    stateful.running_domain_totals_bucketed: at 100 TB sessionize is
    the state-heavy operator (every live domain holds an open-session
    list), and per-group Python-call overhead — not merge work — is
    the measured bottleneck past ~10^6 live keys.

    ``buckets=None`` derives the count from defaultParallelism and the
    optional ``est_keys`` via stateful.default_bucket_count (logged —
    see that docstring's warning: changing the bucket count between
    restarts of a checkpointed query re-shards state incorrectly; pin
    ``buckets`` for any query that must survive a resize, or guard the
    restart with stateful.validate_bucket_count)."""
    _require_rocksdb(decoded)
    from flink_wikipedia_spark.streaming.stateful import resolve_bucket_count

    buckets = resolve_bucket_count(
        decoded, buckets, est_keys, operator="sessionize_with_timers_bucketed"
    )
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    return (
        decoded.select("domain", "ts", "old_length", "new_length")
        .filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .select(
            F.pmod(F.xxhash64("domain"), F.lit(buckets)).alias("bucket"),
            "domain",
            "ts",
            "old_length",
            "new_length",
        )
        .groupBy("bucket")
        .transformWithStateInPandas(
            statefulProcessor=_BucketedSessionProcessor(gap_ms),
            outputStructType=SESSION_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )
