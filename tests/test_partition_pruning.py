"""Partition-pruning evidence: a date-partitioned parquet layout must
let a date-filtered scan touch ONLY the matching partition directories —
the mechanism that turns a 100 TB table into a one-day read.

Complements tests/test_bucketing.py (shuffle elimination); together they
cover the two physical-layout levers SCALE.md leans on.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_wikipedia_spark.schemas import load_table


def test_date_partitioned_scan_prunes_files(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_day")
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(out)
    )

    all_days = spark.read.parquet(out)
    n_days = all_days.select("event_date").distinct().count()
    assert n_days > 1, "fixture must span multiple days for pruning to mean anything"

    one_day = all_days.select(F.max("event_date")).first()[0]
    pruned = all_days.filter(F.col("event_date") == F.lit(one_day))

    # physical evidence: the predicate lands in the scan's
    # PartitionFilters (directory-level pruning) and leaves DataFilters
    # empty — no row ever needs filtering because no non-matching file
    # is opened. (inputFiles() is NOT usable as evidence: it reflects
    # the unpruned relation.)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "event_date" in part_filters
    assert "DataFilters: []" in plan

    # and the pruned read returns exactly that day's rows
    expected = (
        ev.withColumn("event_date", F.to_date("ts"))
        .filter(F.col("event_date") == F.lit(one_day))
        .count()
    )
    assert pruned.count() == expected


def test_clustered_write_bounds_file_count(spark, tmp_path):
    """Small-files evidence: a naive partitionBy write emits one file
    per (task × partition value); clustering on the partition column
    first collapses that to ~1, and maxRecordsPerFile re-splits to a
    bounded size — write-time layout control, sources/batch.py."""
    import glob

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").repartition(8)
    from flink_wikipedia_spark.sources.batch import write_partitioned

    naive = str(tmp_path / "naive")
    write_partitioned(docs, naive, partition_cols=["lang"])
    clustered = str(tmp_path / "clustered")
    write_partitioned(
        docs, clustered, partition_cols=["lang"], sort_cols=["doc_id"],
        cluster=True, max_records_per_file=10_000,
    )

    def files_per_dir(root):
        return {
            d.rsplit("/", 1)[1]: len(glob.glob(f"{d}/*.parquet"))
            for d in glob.glob(f"{root}/lang=*")
        }

    n_naive, n_clustered = files_per_dir(naive), files_per_dir(clustered)
    assert set(n_naive) == set(n_clustered)
    # every upstream task wrote into (almost) every partition dir...
    assert sum(n_naive.values()) > 3 * len(n_naive)
    # ...while the clustered layout emits exactly one bounded file each
    assert all(n == 1 for n in n_clustered.values()), n_clustered
    # and the data survives identically
    a = spark.read.parquet(naive).select("doc_id").collect()
    b = spark.read.parquet(clustered).select("doc_id").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
