"""Property pin for _SessionGapProcessor (streaming/stateful_v2):
against a 10-line reference sessionizer — sort, split on strict
``gap > gap_ms`` (the batch twin q_sessionize's boundary), sum sizes —
the processor must produce the identical session multiset for

1. any single batch of events (duplicates, exact-gap boundaries,
   pathological clustering — hypothesis's job), closed out by firing
   the final timer;
2. any IN-ORDER split of the same events into consecutive batches
   (state survives the batch seams; intra-batch "gap" closes plus the
   final timer close must still equal the reference).

Pure Python (fake handle harness from test_stateful_v2) — no Spark
session, so hypothesis can afford hundreds of examples.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_wikipedia_spark.streaming.stateful_v2 import _SessionGapProcessor
from tests.test_stateful_v2 import FakeExpired, FakeHandle, FakeTimerValues

GAP_MS = 30_000
BASE_MS = 1_700_000_000_000  # fixed epoch anchor, any value works

# offsets in ms; scale spans well below / exactly at / above the gap
event = st.tuples(
    st.integers(min_value=0, max_value=10 * GAP_MS),  # ts offset
    st.integers(min_value=0, max_value=1000),         # |size|
)
events_strategy = st.lists(event, min_size=1, max_size=40)


def reference_sessions(events: list[tuple[int, int]]) -> list[tuple]:
    """Strict-> sessionization: (start, end, n, size) per session."""
    ts = sorted(events)
    out = []
    start, end, n, size = ts[0][0], ts[0][0], 1, ts[0][1]
    for t, sz in ts[1:]:
        if t - end > GAP_MS:
            out.append((start, end, n, size))
            start, end, n, size = t, t, 1, sz
        else:
            end, n, size = t, n + 1, size + sz
    out.append((start, end, n, size))
    return sorted(out)


def pdf_of(events: list[tuple[int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [BASE_MS + t for t, _ in events], unit="ms"
            ),
            "old_length": [0] * len(events),
            "new_length": [sz for _, sz in events],
        }
    )


def _rows(emitted) -> list[tuple]:
    out = []
    for df in emitted:
        for _, r in df.iterrows():
            out.append(
                (
                    int(r["session_start"].value // 10**6) - BASE_MS,
                    int(r["session_end"].value // 10**6) - BASE_MS,
                    int(r["n_events"]),
                    int(r["total_size"]),
                )
            )
    return sorted(out)


def drive(
    batches: list[list[tuple[int, int]]], wm_delay_ms: int | None = None
) -> list[tuple]:
    """Feed batches in order, fire timers as the watermark advances,
    then close out everything; return the emitted session multiset as
    (start, end, n, size) with BASE_MS removed.

    wm_delay_ms None = the watermark never advances during input (all
    closes happen at the end, via timers); an integer simulates the
    engine's ``max event time seen - delay`` watermark, firing due
    timers after each batch — which exercises the input-time "gap"
    close path as well."""
    p = _SessionGapProcessor(GAP_MS)
    h = FakeHandle()
    p.init(h)
    key = ("a.org",)
    emitted = []
    wm = 0
    for batch in batches:
        tv = None if wm_delay_ms is None else FakeTimerValues(BASE_MS + wm)
        for df in p.handleInputRows(key, iter([pdf_of(batch)]), tv):
            emitted.append(df)
        if wm_delay_ms is not None:
            wm = max(wm, max(t for t, _ in batch) - wm_delay_ms)
            for t in sorted(x for x in h.timers if x <= BASE_MS + wm):
                h.timers.discard(t)
                for df in p.handleExpiredTimer(key, None, FakeExpired(t)):
                    emitted.append(df)
    # end of stream: the watermark eventually passes every deadline
    if h.states["sessions"].get() is not None:
        final = max(h.timers)
        for df in p.handleExpiredTimer(key, None, FakeExpired(final)):
            emitted.append(df)
    assert h.states["sessions"].get() is None
    return _rows(emitted)


@settings(max_examples=200, deadline=None)
@given(events_strategy)
def test_single_batch_matches_reference(events):
    assert drive([events]) == reference_sessions(events)


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.data())
def test_inorder_batch_splits_match_reference(events, data):
    # cut the time-sorted stream into consecutive chunks at random seams
    # (in-order arrival — the watermark-legal general case)
    ordered = sorted(events)
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(4, len(ordered) - 1)))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(ordered) - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
        if len(ordered) > 1
        else []
    )
    batches, prev = [], 0
    for c in [*cuts, len(ordered)]:
        if c > prev:
            batches.append(ordered[prev:c])
            prev = c
    assert drive(batches) == reference_sessions(events)


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.data())
def test_any_late_event_matches_reference_while_watermark_stalls(events, data):
    # adversarial lateness: hold back ANY one event — including a
    # bridge that re-merges runs an earlier batch had split, the case
    # eager closing gets wrong — and deliver it in a final batch. With
    # the watermark not yet past the affected runs (None = stalled),
    # the processor must still equal the batch twin.
    if len(events) < 2:
        return
    ordered = sorted(events)
    idx = data.draw(st.integers(min_value=0, max_value=len(ordered) - 1))
    held = ordered[idx]
    rest = ordered[:idx] + ordered[idx + 1 :]
    assert drive([rest, [held]]) == reference_sessions(events)


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.data())
def test_advancing_watermark_matches_reference(events, data):
    # in-order chunks with the engine's watermark rule (max event time
    # seen - delay) firing timers between batches — exercises the
    # input-time "gap" close path and partial timer expiry. Any delay
    # is legal for in-order arrival.
    ordered = sorted(events)
    delay = data.draw(st.integers(min_value=0, max_value=4 * GAP_MS))
    n_cuts = data.draw(
        st.integers(min_value=0, max_value=min(4, len(ordered) - 1))
    )
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(ordered) - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
        if len(ordered) > 1
        else []
    )
    batches, prev = [], 0
    for c in [*cuts, len(ordered)]:
        if c > prev:
            batches.append(ordered[prev:c])
            prev = c
    assert drive(batches, wm_delay_ms=delay) == reference_sessions(events)
