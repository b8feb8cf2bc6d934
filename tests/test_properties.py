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


# --- rows-only tail: sketch/iterative queries get REAL invariants ----------
# (VERDICT r4 item 7: rows>0 alone says nothing; each approximate or
# iterative query is pinned to its exact twin by a quantitative bound.)


def test_hll_within_5pct_of_exact(spark):
    """approx_count_distinct at rsd=0.02 must land within 5% of the
    exact per-group distinct count (2.5 sigma of its own error model —
    loose enough to be flake-free, tight enough to catch a wrong column
    or a dropped groupBy key)."""
    from flink_wikipedia_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    exact = {
        r.event_type: r.n_users
        for r in REGISTRY["q_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in REGISTRY["q_approx_distinct_users"].fn(spark, SF_SMOKE).collect()
    }
    assert set(approx) == set(exact)
    for etype, est in approx.items():
        rel_err = abs(est - exact[etype]) / exact[etype]
        assert rel_err <= 0.05, (
            f"{etype}: HLL={est} exact={exact[etype]} rel_err={rel_err:.3f}"
        )


def test_approx_percentile_rank_bounds(spark):
    """approx_percentile(accuracy=1000) guarantees rank error <= n/1000.
    Check the empirical CDF at each returned p50/p90 sits within the
    target quantile ± (1/1000 + a nulls/ties allowance)."""
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.schemas import load_table
    from tests.conftest import SF_SMOKE

    got = {
        r.event_type: (r.p50, r.p90)
        for r in REGISTRY["q_approx_percentile_value"].fn(spark, SF_SMOKE).collect()
    }
    vals = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .toPandas()
        .groupby("event_type")["value"]
    )
    for etype, (p50, p90) in got.items():
        xs = vals.get_group(etype).dropna().sort_values().to_numpy()
        n = len(xs)
        assert xs[0] <= p50 <= p90 <= xs[-1]
        for target, p in ((0.5, p50), (0.9, p90)):
            cdf_lo = (xs < p).sum() / n   # strictly-below fraction
            cdf_hi = (xs <= p).sum() / n  # at-or-below fraction
            eps = 1.0 / 1000 + 2.0 / n    # rank bound + tie slack
            assert cdf_lo - eps <= target <= cdf_hi + eps, (
                f"{etype} q{target}: value {p} has CDF "
                f"[{cdf_lo:.4f},{cdf_hi:.4f}]"
            )


def test_kmeans_improves_on_init(spark):
    """Lloyd's iterations never increase inertia: the returned centroids
    must fit each language's n_chars at least as well as the min/max
    init the query starts from, and every count/centroid invariant must
    hold (counts partition the group, centroids inside the data range,
    c_small <= c_large)."""
    import numpy as np

    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.schemas import load_table
    from tests.conftest import SF_SMOKE

    res = {
        r.lang: r
        for r in REGISTRY["q_kmeans_doclen"].fn(spark, SF_SMOKE).collect()
    }
    by_lang = (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "n_chars")
        .toPandas()
        .groupby("lang")["n_chars"]
    )

    def inertia(x, c0, c1):
        return float(np.minimum((x - c0) ** 2, (x - c1) ** 2).sum())

    for lang, r in res.items():
        x = by_lang.get_group(lang).to_numpy(dtype="float64")
        assert r.n_small + r.n_large == len(x)
        assert x.min() <= r.c_small <= r.c_large <= x.max()
        init = inertia(x, x.min(), x.max())
        final = inertia(x, r.c_small, r.c_large)
        assert final <= init + 1e-9, (
            f"{lang}: inertia rose {init} -> {final}"
        )


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=200_000),
)
@settings(max_examples=200, deadline=None)
def test_waterfill_closed_form_matches_iterative(sizes, budget):
    """The algebra q_token_budget_waterfill's SQL depends on: processing
    sources ascending, source i saturates iff n_i <= (B - prefix_i) /
    remaining_slots_i, and the common cap is (B - sum saturated) /
    |unsaturated|. Must agree with the obvious iterative water-filling
    (repeatedly grant min(n_i, fair share), recompute) to float
    tolerance for arbitrary size/budget combinations."""
    xs = sorted(sizes)

    # closed form, EXACTLY the query's window math: prefix is the sum of
    # ALL previous sizes (unconditional window prefix), not just the
    # saturated ones — with only-saturated accumulation the rule
    # misclassifies (e.g. sizes [1,1], budget 1)
    k = len(xs)
    sat_flags = []
    prefix = 0
    for i, n in enumerate(xs):
        fair = (budget - prefix) / (k - i)
        sat_flags.append(n <= fair)
        prefix += n
    sat_sum = sum(n for n, f in zip(xs, sat_flags) if f)
    n_unsat = sum(1 for f in sat_flags if not f)
    cap = (budget - sat_sum) / n_unsat if n_unsat else None
    closed = [float(n) if f else cap for n, f in zip(xs, sat_flags)]

    # iterative reference: grant fair shares, freeze saturated, repeat
    remaining = float(budget)
    grants = [None] * k
    active = list(range(k))
    while active:
        fair = remaining / len(active)
        newly = [i for i in active if xs[i] <= fair]
        if not newly:
            for i in active:
                grants[i] = fair
            break
        for i in newly:
            grants[i] = float(xs[i])
            remaining -= xs[i]
        active = [i for i in active if i not in newly]

    assert all(g is not None for g in grants)
    for c, g in zip(closed, grants):
        assert math.isclose(c, g, rel_tol=1e-9, abs_tol=1e-6), (xs, budget, closed, grants)
    # conservation: total granted = min(budget, total supply)
    assert math.isclose(
        sum(grants), min(budget, sum(xs)), rel_tol=1e-9, abs_tol=1e-6
    )


# --- bucketed Python state (streaming/stateful.py) ------------------------


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),     # domain id
            st.integers(min_value=-1000, max_value=1000),  # old
            st.integers(min_value=-1000, max_value=1000),  # new
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=59), max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_bucketed_state_update_matches_reference(events, cuts):
    """_update_totals_bucketed over ANY batch split must equal the
    dict-based reference over the whole stream: per-domain lifetime
    (count, Σ|new−old|), rows emitted exactly for domains seen in each
    batch. Pure-Python harness — the Spark-side equivalence is pinned
    by tests/test_stateful.py; this covers the merge math broadly."""
    from flink_wikipedia_spark.streaming.stateful import (
        _update_totals_bucketed,
    )

    want: dict[str, tuple[int, int]] = {}
    for d, old, new in events:
        n, s = want.get(f"d{d}", (0, 0))
        want[f"d{d}"] = (n + 1, s + abs(new - old))

    bounds = sorted({c for c in cuts if c < len(events)})
    batches, prev = [], 0
    for b in bounds + [len(events)]:
        if b > prev:
            batches.append(events[prev:b])
            prev = b

    state = _FakeGroupState()
    got_last: dict[str, tuple[int, int]] = {}
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "domain": [f"d{d}" for d, _, _ in batch],
                "old_length": [o for _, o, _ in batch],
                "new_length": [n for _, _, n in batch],
            }
        )
        (out,) = list(_update_totals_bucketed((0,), iter([pdf]), state))
        assert sorted(out["domain"]) == sorted(pdf["domain"].unique())
        for r in out.itertuples():
            got_last[r.domain] = (r.n_edits, r.total_edit_size)

    assert got_last == want
    domains, ns, ss = state.get
    assert {d: (n, s) for d, n, s in zip(domains, ns, ss)} == want
