"""Skew handling: salted two-phase aggregation (SURVEY.md §4.3(4)).

The reference's real-world key distribution is brutally skewed —
en.wikipedia.org dominates Wikipedia edit volume — and its single
hash-partition on domain (``DataStreamJob.java:84``) sends the hot key
to one task. For Spark **aggregates** the partial/final split already
absorbs skew, but when a grouping key's partial-state cardinality is
itself huge per key (e.g. collecting per-key distincts) or when AQE is
off, explicit salting is the tool:

    phase 1: group by (key, salt=hash(row)%N) — hot key splits N ways
    phase 2: group by key — merge the N partials

Semantics are identical to a direct groupBy; only the physical shuffle
distribution changes. The oracle for a salted query is therefore the
plain GROUP BY — same results, different plan — which is exactly how
q_salted_agg_edit_size is checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_exprs: dict[str, Column],
    count_alias: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for sums/counts (re-aggregable
    functions). ``sum_exprs`` maps output alias → column expression to
    sum (already decimal-cast by the caller if determinism demands).

    The salt is a uniform hash of a per-row value (here the full row via
    monotonically varying spark_partition_id + a cheap column hash isn't
    needed — `rand` would break determinism, so we hash the row's own
    columns), keeping results reproducible."""
    salt = F.abs(F.hash(*[F.col(c) for c in df.columns]) % n_salts).alias("_salt")
    phase1 = (
        df.select(*key_cols, salt, *[e.alias(f"_v_{a}") for a, e in sum_exprs.items()])
        .groupBy(*key_cols, "_salt")
        .agg(
            *[F.sum(f"_v_{a}").alias(f"_p_{a}") for a in sum_exprs],
            F.count(F.lit(1)).alias("_p_cnt"),
        )
    )
    aggs = [F.sum(f"_p_{a}").alias(a) for a in sum_exprs]
    if count_alias:
        aggs.append(F.sum("_p_cnt").alias(count_alias))
    return phase1.groupBy(*key_cols).agg(*aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join by key salting: each fact row gets a
    deterministic salt in [0, n_salts) hashed from its own columns, the
    dim side replicates ×n_salts, and the join runs on (key, salt) — a
    hot fact key now spreads over n_salts shuffle partitions instead of
    melting one task.

    Results are identical to ``fact.join(dim, on, how)`` (inner/left):
    every fact row still meets exactly the dim rows of its key. Use
    when AQE's runtime skew-split isn't available — a fixed plan, a
    stream-static join inside a micro-batch, or an engine pinned to
    static partitioning; prefer a plain broadcast when the dim fits.
    Cost: dim shuffle volume ×n_salts — cheap for a dim, the reason
    this is a fact⋈DIM tool, never fact⋈fact."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.abs(F.hash(*[F.col(c) for c in fact.columns]) % n_salts)
    salted_fact = fact.withColumn("_salt", salt)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, [on, "_salt"], how).drop("_salt")
