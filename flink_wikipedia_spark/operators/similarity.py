"""Similarity search over embedding columns (north star E2):
brute-force cosine top-k (the correctness baseline) and an LSH-bucketed
variant (the 100 TB path). Embedding near-dup detection reuses the same
cosine kernel.

Cosine is computed with built-in higher-order array functions
(zip_with + aggregate) — JVM codegen, no Python. The fold is strictly
left-to-right on both engines, and inputs are cast element-wise
float→double (exact), so Spark and the DuckDB oracle produce
bit-identical similarities, rounded to 6 dp for belt-and-braces.

Scale design (the part that matters at 100 TB):
- brute force is O(|Q|·|C|); it exists as the oracle-checkable baseline
  and for small |Q| with a broadcast query set;
- the LSH variant buckets vectors by the sign pattern of 8 fixed
  hyperplane projections → candidates collide in expected-similar
  buckets; the join is an equi-join on bucket id, so the cross product
  never materializes. More planes/band-OR repetitions trade recall for
  candidate count — constants live in functions/constants.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.constants import LSH_NUM_PLANES, LSH_PLANES


def _fold_sum(arr: Column) -> Column:
    """Left-to-right double sum of an array (deterministic fold order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def dot_expr(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    """dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))) — exact expression
    mirrored in SQL by the sql_cosine_duckdb template."""
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def sql_dot_duckdb(a: str, b: str) -> str:
    """DuckDB twin of dot_expr: same element order, same fold order."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(len({a})), "
        f"i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def sql_cosine_duckdb(a: str, b: str) -> str:
    return (
        f"{sql_dot_duckdb(a, b)} / "
        f"(sqrt({sql_dot_duckdb(a, a)}) * sqrt({sql_dot_duckdb(b, b)}))"
    )


def lsh_bucket_expr(vec: Column) -> Column:
    """LSH bucket id: Σ_j [dot(vec, plane_j) > 0]·2^j over the fixed
    integer-valued hyperplanes (plan literals — no broadcast needed).

    Hyperplane components are small integers, so each projection is an
    exact double computation on both engines."""
    bucket: Column = F.lit(0).cast("long")
    for j in range(LSH_NUM_PLANES):
        plane = F.array(*[F.lit(c) for c in LSH_PLANES[j]])
        bucket = bucket + F.when(dot_expr(vec, plane) > 0.0, F.lit(2**j)).otherwise(
            F.lit(0)
        )
    return bucket


def sql_lsh_bucket_duckdb(vec: str) -> str:
    terms = []
    for j in range(LSH_NUM_PLANES):
        lits = ", ".join(
            f"{c:.1f}" for c in LSH_PLANES[j]
        )
        terms.append(
            f"(CASE WHEN {sql_dot_duckdb(vec, f'[{lits}]')} > 0.0 "
            f"THEN {2**j} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def dist2_expr(a: Column, b: Column) -> Column:
    """Squared L2 distance, same deterministic fold as dot_expr."""
    return _fold_sum(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        )
    )


def sql_dist2_duckdb(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(len({a})), "
        f"i -> (CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE)) * "
        f"(CAST({a}[i+1] AS DOUBLE) - CAST({b}[i+1] AS DOUBLE)))), "
        f"(acc, v) -> acc + v)"
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its n_probe nearest
    centroid cells (rank by rounded squared-L2, centroid id tie-break).

    The centroid table is tiny by construction (a real deployment trains
    k-means offline; here the first NC corpus vectors serve as fixed
    centroids) and broadcasts — assignment is a narrow map over the
    corpus, one pass, no shuffle until the ranking window on vec_id
    (which AQE keeps local since the join output is already keyed)."""
    from pyspark.sql import Window

    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cent")
    )
    scored = vectors.crossJoin(F.broadcast(c)).select(
        id_col,
        vec_col,
        "centroid_id",
        F.round(dist2_expr(F.col(vec_col), F.col("_cent")), 6).alias("_d2"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d2").asc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_probe)
        .select(id_col, vec_col, "centroid_id")
    )


def topk_cosine(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    all candidates, rank per query on round(sim, 6) with id tie-break.

    Per-query ranking uses the window top-k pattern — one shuffle on
    query_id, never a global sort."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )
