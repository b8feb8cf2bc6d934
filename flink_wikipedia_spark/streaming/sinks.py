"""Streaming sinks (reference O11, ``DataStreamJob.java:125-135``: a
MongoSink with 1000-doc batches, 3 retries, at-least-once).

Our sink abstraction is ``foreachBatch`` + a small sink object:
foreachBatch hands us a batch DataFrame and an epoch id, and the sink
decides idempotency. The reference's at-least-once + no checkpointing
means replayed duplicates AND lost windows; ours checkpoints every
query (exactly-once state) and makes the sink idempotent by keying
writes on the epoch (parquet) or upserting on the natural key
(domain, window_start) — the SURVEY.md §7 "hard part (4)" answer.

A real Mongo deployment would use the mongo-spark-connector in the
same foreachBatch seam (upsert on (domain, window_start)); not
installable here, so ParquetSink/MemorySink are the shipping sinks.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame


class MemorySink:
    """Collects batches in memory — the assertion sink for tests
    (bounded use only)."""

    def __init__(self) -> None:
        self.batches: list[tuple[int, list]] = []
        self._lock = threading.Lock()

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        with self._lock:
            self.batches.append((epoch_id, rows))

    @property
    def rows(self) -> list:
        with self._lock:
            return [r for _, rows in self.batches for r in rows]


class ParquetSink:
    """Idempotent parquet writer: each epoch lands in its own
    subdirectory, so a replayed epoch overwrites itself instead of
    duplicating — at-least-once foreachBatch upgraded to effective
    exactly-once."""

    def __init__(self, path: str) -> None:
        self.path = path

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{self.path}/epoch={epoch_id}")


class UpsertParquetSink:
    """Upsert-keyed sink — the twin of the reference's Mongo writes
    (``DataStreamJob.java:125-135``), which replace documents by key.
    Each batch merges into the keyed store: existing rows with matching
    keys are replaced, others kept (SURVEY.md §7 hard part (4): the
    flagship keys on (domain, window_start), making at-least-once
    replays invisible).

    Implementation is read-merge-overwrite on parquet, fine for
    window-aggregate volumes (output is |keys × windows|, not events);
    a real deployment swaps in Delta/Iceberg MERGE or Mongo
    replaceOne(upsert) through this same seam."""

    def __init__(self, path: str, key_cols: list[str]) -> None:
        self.path = path
        self.key_cols = key_cols

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        batch = batch_df.cache()
        try:
            if os.path.exists(self.path):
                existing = spark.read.parquet(self.path)
                keep = existing.join(
                    batch.select(*self.key_cols).distinct(),
                    self.key_cols,
                    "left_anti",
                )
                merged = keep.unionByName(batch)
            else:
                merged = batch
            tmp = self.path + ".staging"
            merged.write.mode("overwrite").parquet(tmp)
            final = spark.read.parquet(tmp)
            final.write.mode("overwrite").parquet(self.path)
        finally:
            batch.unpersist()
