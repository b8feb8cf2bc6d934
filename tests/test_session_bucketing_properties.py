"""Property pin: the hash-bucketed sessionizer is FULLY equal to the
per-key one — session data AND closed_by label — for ANY assignment of
domains to buckets, any in-order batch split, and any watermark
cadence.

r13 upgrade: closed_by is now part of the compared tuple. The r12
docstring hedged that a stale bucket timer (undeletable per domain)
might close a run one batch earlier than the per-key 'gap' close; that
case is unreachable under the input-then-timers batch discipline both
the engine and this harness follow: a run is sweepable by a stale
timer only if its own deadline ≤ the stale expiry ≤ the watermark, and
every stored run always holds a live timer at exactly its own deadline
(registered at input time, never deleted in the bucketed layout), so
its OWN timer fires in the same batch with the same 'timer' label —
and input-time 'gap' emission checks the identical deadline<wm
condition at the identical wm in both layouts. The property below is
the proof-by-adversarial-search (see also the analysis in
_BucketedSessionProcessor's docstring).

Pure Python over the fake handle harness (no Spark session), so
hypothesis can afford hundreds of adversarial examples — the same
budget argument as tests/test_stateful_bucketing_properties.py.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_wikipedia_spark.streaming.stateful_v2 import (
    _BucketedSessionProcessor,
    _SessionGapProcessor,
)
from tests.test_stateful_v2 import FakeExpired, FakeHandle, FakeTimerValues

GAP_MS = 30_000
BASE_MS = 1_700_000_000_000

DOMAINS = ["a.org", "b.org", "c.org", None]

event = st.tuples(
    st.sampled_from(DOMAINS),
    st.integers(min_value=0, max_value=8 * GAP_MS),  # ts offset
    st.integers(min_value=0, max_value=1000),        # |size|
)
batches_strategy = st.lists(
    st.lists(event, min_size=1, max_size=15), min_size=1, max_size=4
)
# any partition of the 4 domains into 2 buckets
assignment_strategy = st.tuples(*[st.integers(0, 1) for _ in DOMAINS])


def _pdf(rows):
    return pd.DataFrame(
        {
            "domain": [d for d, _, _ in rows],
            "ts": pd.to_datetime([BASE_MS + t for _, t, _ in rows], unit="ms"),
            "old_length": [0] * len(rows),
            "new_length": [sz for _, _, sz in rows],
        }
    )


def _norm(d):
    return None if d is None or (isinstance(d, float) and pd.isna(d)) else d


def _rows(emitted) -> list[tuple]:
    # closed_by INCLUDED (r13): the pin is full equality, labels too
    out = []
    for df in emitted:
        for _, r in df.iterrows():
            out.append(
                (
                    _norm(r["domain"]),
                    int(r["session_start"].value // 10**6) - BASE_MS,
                    int(r["session_end"].value // 10**6) - BASE_MS,
                    int(r["n_events"]),
                    int(r["total_size"]),
                    str(r["closed_by"]),
                )
            )
    return sorted(out, key=lambda t: (str(t[0]), t[1:]))


def _fire_due(proc, handle, key, wm_abs, emitted):
    for t in sorted(x for x in handle.timers if x <= wm_abs):
        handle.timers.discard(t)
        for df in proc.handleExpiredTimer(key, None, FakeExpired(t)):
            emitted.append(df)


def _flush(proc, handle, key, emitted):
    while handle.timers:
        t = max(handle.timers)
        handle.timers.clear()
        for df in proc.handleExpiredTimer(key, None, FakeExpired(t)):
            emitted.append(df)


def run_per_key(batches, wm_delay_ms):
    procs, handles, emitted = {}, {}, []
    wm = 0
    for batch in batches:
        batch = [e for e in batch if e[1] >= wm]  # engine drops < wm
        for dom in {d for d, _, _ in batch}:
            rows = [e for e in batch if e[0] == dom]
            if dom not in procs:
                procs[dom] = _SessionGapProcessor(GAP_MS)
                handles[dom] = FakeHandle()
                procs[dom].init(handles[dom])
            for df in procs[dom].handleInputRows(
                (dom,), iter([_pdf(rows)]), FakeTimerValues(BASE_MS + wm)
            ):
                emitted.append(df)
        if batch:
            wm = max(wm, max(t for _, t, _ in batch) - wm_delay_ms)
        for dom in procs:
            _fire_due(procs[dom], handles[dom], (dom,), BASE_MS + wm, emitted)
    for dom in procs:
        _flush(procs[dom], handles[dom], (dom,), emitted)
        assert handles[dom].states["sessions"].get() is None
    return _rows(emitted)


def run_bucketed(batches, wm_delay_ms, bucket_of):
    procs, handles, emitted = {}, {}, []
    wm = 0
    for batch in batches:
        batch = [e for e in batch if e[1] >= wm]
        for b in {bucket_of(d) for d, _, _ in batch}:
            rows = [e for e in batch if bucket_of(e[0]) == b]
            if b not in procs:
                procs[b] = _BucketedSessionProcessor(GAP_MS)
                handles[b] = FakeHandle()
                procs[b].init(handles[b])
            for df in procs[b].handleInputRows(
                (b,), iter([_pdf(rows)]), FakeTimerValues(BASE_MS + wm)
            ):
                emitted.append(df)
        if batch:
            wm = max(wm, max(t for _, t, _ in batch) - wm_delay_ms)
        for b in procs:
            _fire_due(procs[b], handles[b], (b,), BASE_MS + wm, emitted)
    for b in procs:
        _flush(procs[b], handles[b], (b,), emitted)
        assert handles[b].states["bucket_sessions"].get() is None
    return _rows(emitted)


@settings(max_examples=150, deadline=None)
@given(batches_strategy, assignment_strategy,
       st.sampled_from([0, GAP_MS // 2, 2 * GAP_MS]))
def test_bucketed_equals_per_key_any_assignment(batches, assign, wm_delay):
    table = dict(zip(DOMAINS, assign))
    assert run_bucketed(batches, wm_delay, table.__getitem__) == run_per_key(
        batches, wm_delay
    )


@settings(max_examples=150, deadline=None)
@given(batches_strategy, st.sampled_from([0, GAP_MS // 2, 2 * GAP_MS]))
def test_all_domains_one_bucket_equals_per_key(batches, wm_delay):
    """The adversarial extreme: EVERY domain in a single bucket."""
    assert run_bucketed(batches, wm_delay, lambda d: 0) == run_per_key(
        batches, wm_delay
    )
