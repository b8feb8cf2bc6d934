"""Custom stateful streaming operators via applyInPandasWithState —
the generalization of the reference's WindowFunction shape
(``DataStreamJob.java:93-108``: user code + per-key managed state).
SURVEY.md §4.3(3): nothing in the inventory *needs* this (every
inventoried aggregate compiles to native operators, which is always
preferable); the hook exists for semantics Spark's aggregates can't
express — per-key session machines, custom eviction, cross-event
pattern state.

Scale notes: state lives in the state store (RocksDB per session.py —
disk-backed, checkpointed); each key's state must stay O(1)-ish, which
``running_domain_totals`` respects (two counters per key). Arrow moves
grouped batches; the Python worker sees one key's rows per call.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "domain string, n_edits long, total_edit_size long"
_STATE_SCHEMA = "n long, s long"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += int((pdf["new_length"] - pdf["old_length"]).abs().sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"domain": [key[0]], "n_edits": [n], "total_edit_size": [s]}
    )


def running_domain_totals(decoded: DataFrame) -> DataFrame:
    """Per-domain lifetime counters, one updated row per key per batch —
    a custom stateful op the windowed aggregate can't express (state
    never expires; output cadence = trigger cadence)."""
    return (
        decoded.select("domain", "old_length", "new_length")
        .groupBy("domain")
        .applyInPandasWithState(
            _update_totals,
            RUNNING_TOTALS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def purchases_with_recent_views(
    left: DataFrame, right: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join with a time-range constraint (no
    reference equivalent — Flink's interval join analog). Both sides
    carry watermarks; Spark bounds join state to the `within` horizon
    on each side — state is O(rate × horizon), not O(stream).

    left/right: decoded edit-event streams (any keyed pair works; the
    test joins per-domain 'edit' events to earlier 'view'-like events).
    """
    l = left.select(
        F.col("domain").alias("l_domain"),
        F.col("ts").alias("l_ts"),
        F.col("new_length").alias("l_new_length"),
    ).withWatermark("l_ts", "1 second")
    r = right.select(
        F.col("domain").alias("r_domain"),
        F.col("ts").alias("r_ts"),
        F.col("new_length").alias("r_new_length"),
    ).withWatermark("r_ts", "1 second")
    return l.join(
        r,
        (F.col("l_domain") == F.col("r_domain"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("r_ts") < F.col("l_ts")),
        "inner",
    )
