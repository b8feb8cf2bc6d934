"""Relational breadth operators (SURVEY.md §2.2, E4–E9) plus the two
time-series joins Spark has no built-in for: **as-of join** and
**range (interval) join** — implemented shuffle-lean, not via cross
products.

The reference has none of these (its repo greps clean for
join/union/sort — SURVEY.md §2.2); they're the capability surface the
north star demands at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def topk_per_group(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_alias: str = "rk",
) -> DataFrame:
    """Top-k per group via ranked analytic window (E4).

    Physical plan: one shuffle on the partition columns, then a
    per-partition sort — never a global sort. At scale prefer this over
    ``orderBy().limit()`` whenever a grouping key exists. Order columns
    must be a total order (include a unique tiebreaker) or the result
    is nondeterministic.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key. Spark has no built-in
    (DuckDB's ``ASOF JOIN`` is the oracle twin).

    Implementation is the **union + last-ignoring-nulls window** merge:
    tag both sides, union, and per key take ``last(value, ignorenulls)``
    over rows ordered by (ts, side). Cost: ONE shuffle on the key (the
    window partition) and a per-partition sort — versus the naive
    range-predicate join that Spark would execute as a
    broadcast-nested-loop (quadratic, dead at 100 TB). Right rows must
    be unique per (key, ts); pre-aggregate with ``max_by`` first.

    The tag orders right (0) before left (1) at equal timestamps, so a
    right row at exactly left_ts matches — same tie rule as DuckDB ASOF.
    """
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.withColumn("_ts", F.col(right_ts))
        .withColumn("_side", F.lit(0))
        .select(
            on,
            "_ts",
            "_side",
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        )
    )
    merged = lt.select(
        *[F.col(c) for c in left.columns],
        "_ts",
        "_side",
        *[F.lit(None).cast(rt.schema[f"_r_{c}"].dataType).alias(f"_r_{c}") for c in value_cols],
    ).unionByName(
        rt.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c != on
                else F.col(on)
                for c in left.columns
            ],
            "_ts",
            "_side",
            *[F.col(f"_r_{c}") for c in value_cols],
        )
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *[F.col(c) for c in left.columns],
        "_side",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    range_sec: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Interval join: per left row, count right rows of the same key with
    ``left_ts < right_ts <= left_ts + range_sec`` (timestamps in epoch
    seconds).

    Scale strategy: **bucket equi-join**. Right rows are bucketed by
    ``floor(ts/range)``; any right row inside a left row's window lives
    in the left row's bucket or the next one, so the left side explodes
    to exactly 2 candidate buckets and joins on (key, bucket) — an
    equi-join Catalyst can hash/sort-merge — then the exact range
    predicate refines. Work is O(|L|·2·avg-bucket-size), versus the
    unbounded theta-join Spark would otherwise nested-loop.
    """
    r = right.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        F.floor(F.col(right_ts) / range_sec).alias("_rb"),
    )
    # per-row id so duplicate left rows each keep their own count (the
    # groupBy below must not merge identical left rows)
    l2 = left.withColumn("_rjid", F.monotonically_increasing_id()).withColumn(
        "_lb", F.explode(F.array(F.floor(F.col(left_ts) / range_sec),
                                 F.floor(F.col(left_ts) / range_sec) + 1))
    )
    joined = l2.join(
        r,
        (l2[on] == r["_rk"])
        & (l2["_lb"] == r["_rb"])
        & (r["_rts"] > l2[left_ts])
        & (r["_rts"] <= l2[left_ts] + range_sec),
        "left",
    )
    return (
        joined.groupBy("_rjid", *left.columns)
        .agg(F.count("_rts").alias(count_alias))
        .drop("_rjid")
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` — the Arrow-path twin
    of :func:`asof_join`, pinned to identical output by test. Spark
    co-shuffles both sides on the key ONCE and hands each key's two
    Arrow batches to ``pd.merge_asof`` (backward direction, exact
    matches allowed = the same latest-at-or-before tie rule).

    When to prefer which: the built-in union+window form stays entirely
    in codegen — default choice. The cogrouped form is the template for
    per-key merge logic built-ins CAN'T express (interpolation between
    bracketing rows, per-key model application) — same ONE co-shuffle,
    with Arrow batch transfer as the extra cost. Both are linear;
    neither is the quadratic range-predicate join.

    Per-key state is bounded by that key's rows — a hot key concentrates
    its batch in one task, so pre-split pathological keys upstream."""
    import pandas as pd

    out_fields = [left.schema[c] for c in left.columns] + [
        right.schema[c] for c in value_cols
    ]
    schema = StructType(out_fields)
    lcols, ts_l, ts_r = list(left.columns), left_ts, right_ts

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(ts_l, kind="mergesort")
        rpdf = rpdf[[ts_r, *value_cols]].sort_values(ts_r, kind="mergesort")
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=ts_l, right_on=ts_r, direction="backward"
        )
        return merged[[*lcols, *value_cols]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=schema)
    )
