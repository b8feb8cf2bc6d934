"""Batch readers/writers with explicit schemas.

Schema inference is banned in production paths (schemas.py rationale:
at 100 TB an inference pass is a full extra scan — or worse for JSON,
a full parse). Every reader takes a StructType; the edit-event JSON
reader reuses the streaming decode path so batch replay and live
streams share one serde (SURVEY.md §1.4's batch/stream unification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_wikipedia_spark.operators.core import decode_edit_events


def read_parquet(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).parquet(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC with pinned schema — same contract as read_parquet. ORC
    carries the same columnar virtues (column pruning, predicate
    pushdown into stripe/row-group stats, vectorized read) so the scan
    posture in SCALE.md applies unchanged; it exists for interop with
    Hive-era warehouses that standardized on ORC."""
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with pinned schema + PERMISSIVE corrupt handling (malformed
    rows null out instead of failing the job — the same policy as the
    JSON decode path)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_events(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines edit events via the SAME decode stage the streaming
    pipeline uses (text scan → from_json), so batch replays of captured
    streams are bit-identical to live processing."""
    raw = spark.read.text(path).select(F.col("value"))
    return decode_edit_events(raw)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    cluster: bool = False,
) -> None:
    """Scale-aware parquet layout: directory-partitioned on low-
    cardinality columns (→ partition pruning at read) and sorted within
    files on range-filter columns (→ row-group min/max skipping). This
    is the write-time half of SCALE.md's scan story; bucketed-table
    layouts (shuffle-free joins) additionally need a catalog
    (`saveAsTable` with bucketBy) and are deployment-specific.

    Small-files control: a partitionBy write emits one file per (task ×
    partition value) — with 1000 upstream tasks and 100 values that is
    100k shards of confetti, the classic small-files failure. With
    ``cluster=True`` rows are repartitioned ON the partition columns
    first (each value lands in one task) and ``max_records_per_file``
    re-splits the now-large files to a bounded size. At true scale,
    repartition(N, *cols) with N > |values| plus AQE rebalancing bounds
    the hot-partition tail; the principle — cluster first, cap file
    size second — is the same."""
    if cluster and partition_cols:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) clustering key: bit-interleave N already-bucketed
    integer columns into one long, so sorting by the key clusters rows
    along EVERY dimension at once. Sort-within-partitions by this before
    a parquet write and each row group's min/max footer stats become
    tight in all interleaved columns — multi-dimensional row-group
    skipping at read, where a single-column sort only prunes its own
    column (the Delta/Iceberg OPTIMIZE ZORDER mechanism, as a plain
    column expression).

    ``cols`` must be non-negative ints < 2**bits (bucket/rank upstream:
    ``pmod(hash(x), 2**bits)`` for categoricals, epoch div N for time).
    bits×N must stay ≤ 63. Pure codegen arithmetic — no UDF, no shuffle."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for j, c in enumerate(cs):
            key = key.bitwiseOR(
                F.shiftleft(
                    c.cast("long").bitwiseAND(F.lit(1 << bit).cast("long")),
                    bit * (n - 1) + j,
                )
            )
    return key
