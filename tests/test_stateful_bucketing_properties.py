"""Property pin: the hash-bucketed running-totals operator is
semantics-equal to the per-key one for ANY partition of domains into
buckets, any batch sequence, null domains, and null lengths.

The real-stream equality test (test_stateful.py) proves the full
applyInPandasWithState wiring on a narrow fixture; this drives the two
update FUNCTIONS directly against fake GroupState, so hypothesis can
afford hundreds of adversarial examples (a bucketed-state bug found at
sf100 costs hours; here it costs milliseconds).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_wikipedia_spark.streaming.stateful import (
    _update_totals,
    _update_totals_bucketed,
)

DOMAINS = ["a.org", "b.org", "c.org", "d.org", None]

row = st.tuples(
    st.sampled_from(DOMAINS),
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),  # old
    st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)),  # new
)
batches_strategy = st.lists(
    st.lists(row, min_size=1, max_size=20), min_size=1, max_size=5
)


class FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, t):
        self._v = tuple(t)


def _pdf(rows):
    # float64 with NaN for nulls — what Arrow hands the Python worker
    # for nullable long columns
    return pd.DataFrame(
        {
            "domain": [d for d, _, _ in rows],
            "old_length": pd.Series([o for _, o, _ in rows], dtype="float64"),
            "new_length": pd.Series([n for _, _, n in rows], dtype="float64"),
        }
    )


def _norm_key(d):
    # pandas surfaces a null groupby key as NaN; the operator emits None
    return None if d is None or (isinstance(d, float) and pd.isna(d)) else d


def run_per_key(batches):
    states, out = {}, []
    for batch in batches:
        emitted = {}
        doms = {d for d, _, _ in batch}
        for dom in doms:
            rows = [r for r in batch if r[0] == dom]
            st_ = states.setdefault(dom, FakeGroupState())
            for df in _update_totals((dom,), iter([_pdf(rows)]), st_):
                r = df.iloc[0]
                emitted[_norm_key(r["domain"])] = (
                    int(r["n_edits"]),
                    int(r["total_edit_size"]),
                )
        out.append(emitted)
    return out


def run_bucketed(batches, bucket_of):
    states, out = {}, []
    for batch in batches:
        emitted = {}
        buckets = {bucket_of(d) for d, _, _ in batch}
        for b in buckets:
            rows = [r for r in batch if bucket_of(r[0]) == b]
            st_ = states.setdefault(b, FakeGroupState())
            for df in _update_totals_bucketed((b,), iter([_pdf(rows)]), st_):
                for _, r in df.iterrows():
                    emitted[_norm_key(r["domain"])] = (
                        int(r["n_edits"]),
                        int(r["total_edit_size"]),
                    )
        out.append(emitted)
    return out


@settings(max_examples=200, deadline=None)
@given(batches_strategy, st.integers(min_value=1, max_value=4), st.data())
def test_bucketed_equals_per_key_for_any_bucket_assignment(
    batches, n_buckets, data
):
    # ANY domain→bucket mapping must give identical per-batch output —
    # the operator may not rely on which keys share a bucket
    assignment = {
        d: data.draw(
            st.integers(min_value=0, max_value=n_buckets - 1), label=f"b({d})"
        )
        for d in DOMAINS
    }
    per_key = run_per_key(batches)
    bucketed = run_bucketed(batches, lambda d: assignment[d])
    assert bucketed == per_key


@settings(max_examples=50, deadline=None)
@given(batches_strategy)
def test_all_domains_in_one_bucket_equals_per_key(batches):
    # degenerate worst case: every key in a single bucket (one fat
    # state row carrying the whole keyspace)
    assert run_bucketed(batches, lambda d: 0) == run_per_key(batches)
