"""Property-based checks (SURVEY.md §5.2 layer 4, via hypothesis):

1. decode NEVER throws — arbitrary byte garbage and type-confused JSON
   land in _corrupt_record or null fields (the reference NPEs/throws on
   missing fields and bad numbers, SURVEY.md §3.3);
2. the flagship invariant: engine edit_size per (domain, window) equals
   a pandas-computed Σ|new−old| on the same rows.

Spark round-trips are slow, so strategies run with few, fat examples:
each example is a whole batch of rows.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_wikipedia_spark.operators.core import (
    build_flagship_batch,
    decode_edit_events,
)

# --- strategies -----------------------------------------------------------

garbage_line = st.one_of(
    st.text(max_size=40),
    st.binary(max_size=40).map(lambda b: b.decode("latin1")),
    st.dictionaries(
        st.sampled_from(
            ["id", "domain", "namespace", "timestamp", "user_type",
             "old_length", "new_length", "extra"]
        ),
        st.one_of(st.integers(), st.text(max_size=10), st.none(),
                  st.lists(st.integers(), max_size=3)),
        max_size=6,
    ).map(json.dumps),
)

event_row = st.fixed_dictionaries(
    {
        "domain": st.sampled_from(["a.org", "b.org", "c.org"]),
        "user_type": st.sampled_from(["human", "bot", "HUMAN"]),
        "namespace": st.sampled_from(["main namespace", "talk"]),
        "old_length": st.integers(min_value=0, max_value=10**6),
        "new_length": st.integers(min_value=0, max_value=10**6),
        # minute offsets across a couple of windows
        "minute": st.integers(min_value=0, max_value=14),
    }
)


# --- properties -----------------------------------------------------------


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(garbage_line, min_size=1, max_size=20))
def test_decode_never_throws(spark, lines):
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    rows = decode_edit_events(raw).collect()
    assert len(rows) == len(lines)  # every input line becomes a row


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(event_row, min_size=1, max_size=30))
def test_flagship_matches_pandas_oracle(spark, rows):
    lines = [
        json.dumps(
            {
                "id": i,
                "domain": r["domain"],
                "namespace": r["namespace"],
                "title": "t",
                "timestamp": f"2024-01-01T10:{r['minute']:02d}:00Z",
                "user_name": "u",
                "user_type": r["user_type"],
                "old_length": r["old_length"],
                "new_length": r["new_length"],
            }
        )
        for i, r in enumerate(rows)
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {
        (r.domain, r.window_start.minute): r.edit_size
        for r in build_flagship_batch(decode_edit_events(raw)).collect()
    }

    pdf = pd.DataFrame(rows)
    kept = pdf[
        (pdf.user_type.str.lower() == "human")
        & (pdf.namespace.str.lower() == "main namespace")
    ].copy()
    if kept.empty:
        assert got == {}
        return
    kept["window_minute"] = (kept.minute // 5) * 5
    kept["size"] = (kept.new_length - kept.old_length).abs()
    want = (
        kept.groupby(["domain", "window_minute"])["size"].sum().to_dict()
    )
    assert got == {(d, int(m)): int(v) for (d, m), v in want.items()}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join vs pandas.merge_asof (backward) — an independent third
    implementation of the semantics. Right side deduped to one row per
    (key, ts) with max value-id, mirroring the operator's contract."""
    from flink_wikipedia_spark.operators.relational import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, lid long"
    )
    rraw = pd.DataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(right)],
        columns=["k", "t", "v"],
    )
    # unique per (k, t): keep the max-index row (max_by(v, idx) twin)
    rpd = rraw.groupby(["k", "t"], as_index=False)["v"].max()
    rdf = spark.createDataFrame(rpd, "k long, t long, v double")

    got = {
        r.lid: r.v
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }

    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lid"]
    ).sort_values("t", kind="stable")
    want_df = pd.merge_asof(
        lpd, rpd.sort_values("t"), on="t", by="k", direction="backward"
    )
    want = {
        int(r.lid): (None if math.isnan(r.v) else r.v)
        for r in want_df.itertuples()
    }
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=0, max_size=40
    ),
    range_sec=st.sampled_from([7, 60, 100]),
)
def test_range_join_matches_bruteforce(spark, left, right, range_sec):
    """Bucketed range join vs brute-force python count over
    (t, t+range] — including bucket-boundary cases the 2-bucket explode
    must cover."""
    from flink_wikipedia_spark.operators.relational import range_join_count

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, t long, lid long"
    )
    rdf = spark.createDataFrame(right or [(99, -1)], "k long, t long")
    got = {
        r.lid: r.n_in_range
        for r in range_join_count(
            ldf, rdf, on="k", left_ts="t", right_ts="t", range_sec=range_sec
        ).collect()
    }
    want = {
        i: sum(1 for (rk, rt) in (right or [(99, -1)])
               if rk == k and t < rt <= t + range_sec)
        for i, (k, t) in enumerate(left)
    }
    assert got == want
