"""Real-data pin for _SessionGapProcessor: the driver fixture's events
table (sf0.001, per user_id — the batch twin q_sessionize's key),
replayed through the processor harness in event-time-ordered daily
batches with the engine's watermark rule, must produce exactly the
reference strict-> sessions. Complements the random-data hypothesis
properties with the fixture's actual arrival distribution (bursty
users, long idle gaps, sub-second spacing). Pure pandas — no Spark.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from flink_wikipedia_spark.streaming.stateful_v2 import _SessionGapProcessor
from tests.test_stateful_v2 import FakeExpired, FakeHandle, FakeTimerValues

SF_DIR = "/root/testdata/sf0.001"
GAP_MS = 1_800_000  # 30 min — the batch twin's gap


def _reference(ts_ms: list[int]) -> list[tuple[int, int, int]]:
    """(start, end, n) per session, strict-> split — q_sessionize's
    boundary."""
    out, start, end, n = [], ts_ms[0], ts_ms[0], 1
    for t in ts_ms[1:]:
        if t - end > GAP_MS:
            out.append((start, end, n))
            start, end, n = t, t, 1
        else:
            end, n = t, n + 1
    out.append((start, end, n))
    return out


def test_fixture_events_sessionize_like_the_batch_twin():
    df = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    # ms precision to match the processor's internal unit
    df["ts_ms"] = df["ts"].astype("datetime64[ms]").astype("int64")
    df = df.sort_values(["user_id", "ts_ms"])
    checked_sessions = 0
    for uid, g in df.groupby("user_id"):
        ts_sorted = g["ts_ms"].tolist()
        ref = _reference(ts_sorted)

        p = _SessionGapProcessor(GAP_MS)
        h = FakeHandle()
        p.init(h)
        key = (str(uid),)
        emitted = []
        # event-time-ordered daily batches, engine watermark rule
        # (max event time seen so far - 1 s delay, lagging one batch)
        g = g.assign(day=g["ts"].dt.floor("D"))
        wm = 0
        for _, day_rows in g.groupby("day"):
            pdf = pd.DataFrame(
                {
                    "ts": day_rows["ts"].astype("datetime64[ms]"),
                    "old_length": 0.0,
                    "new_length": 1.0,
                }
            )
            for out in p.handleInputRows(key, iter([pdf]), FakeTimerValues(wm)):
                emitted.append(out)
            wm = max(wm, day_rows["ts_ms"].max() - 1000)
            for t in sorted(x for x in h.timers if x <= wm):
                h.timers.discard(t)
                for out in p.handleExpiredTimer(key, None, FakeExpired(t)):
                    emitted.append(out)
        if h.states["sessions"].get() is not None:
            final = max(h.timers)
            for out in p.handleExpiredTimer(key, None, FakeExpired(final)):
                emitted.append(out)

        got = sorted(
            (
                int(r["session_start"].value // 10**6),
                int(r["session_end"].value // 10**6),
                int(r["n_events"]),
            )
            for out in emitted
            for _, r in out.iterrows()
        )
        assert got == sorted(ref), f"user {uid}: {got[:3]} != {ref[:3]}"
        checked_sessions += len(ref)
    # the fixture must actually exercise multi-session users
    assert checked_sessions > len(df["user_id"].unique())


def test_fixture_events_bucketed_matches_reference():
    """The r12 BUCKETED sessionizer over the same real fixture: ALL
    users hash into 8 buckets (hundreds of domains per bucket — the
    amortization regime the 4-domain property tests can't reach), fed
    in event-time-ordered daily batches; the (user, start, end, n)
    session multiset must equal the per-user reference exactly."""
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _BucketedSessionProcessor,
    )

    df = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    df["ts_ms"] = df["ts"].astype("datetime64[ms]").astype("int64")
    df["domain"] = df["user_id"].map(lambda u: f"u{u}")
    ref = sorted(
        (dom, s, e, n)
        for dom, g in df.sort_values("ts_ms").groupby("domain")
        for s, e, n in _reference(g["ts_ms"].tolist())
    )

    BUCKETS = 8
    df["bucket"] = df["user_id"] % BUCKETS
    procs = {
        b: (_BucketedSessionProcessor(GAP_MS), FakeHandle())
        for b in range(BUCKETS)
    }
    for b, (p, h) in procs.items():
        p.init(h)
    emitted = []
    df = df.assign(day=df["ts"].dt.floor("D"))
    wm = 0
    for _, day_rows in df.sort_values("ts_ms").groupby("day"):
        for b, g in day_rows.groupby("bucket"):
            p, h = procs[b]
            pdf = pd.DataFrame(
                {
                    "domain": g["domain"].tolist(),
                    "ts": g["ts"].astype("datetime64[ms]"),
                    "old_length": 0.0,
                    "new_length": 1.0,
                }
            )
            for out in p.handleInputRows((b,), iter([pdf]), FakeTimerValues(wm)):
                emitted.append(out)
        wm = max(wm, day_rows["ts_ms"].max() - 1000)
        for b, (p, h) in procs.items():
            for t in sorted(x for x in h.timers if x <= wm):
                h.timers.discard(t)
                for out in p.handleExpiredTimer((b,), None, FakeExpired(t)):
                    emitted.append(out)
    for b, (p, h) in procs.items():
        while h.timers:
            t = max(h.timers)
            h.timers.clear()
            for out in p.handleExpiredTimer((b,), None, FakeExpired(t)):
                emitted.append(out)
        assert h.states["bucket_sessions"].get() is None

    got = sorted(
        (
            r["domain"],
            int(r["session_start"].value // 10**6),
            int(r["session_end"].value // 10**6),
            int(r["n_events"]),
        )
        for out in emitted
        for _, r in out.iterrows()
    )
    assert got == ref
