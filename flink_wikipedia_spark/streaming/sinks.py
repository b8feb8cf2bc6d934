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
