"""Example: the reference job, both ways.

Batch replay and live streaming share one transform — run it against
the bundled testdata with no external services:

    python examples/flagship_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_wikipedia_spark.operators.core import decode_edit_events
from flink_wikipedia_spark.schemas import load_table
from flink_wikipedia_spark.session import get_spark
from flink_wikipedia_spark.streaming.pipeline import (
    build_flagship_stream,
    flagship_transform,
)
from flink_wikipedia_spark.streaming.sinks import MemorySink
from flink_wikipedia_spark.streaming.sources import file_source


def events_as_edit_json(spark, sf_dir):
    """Render the events table in the reference's wire format."""
    return load_table(spark, sf_dir, "events").select(
        F.to_json(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("event_type").alias("domain"),
                F.lit("main namespace").alias("namespace"),
                F.lit("t").alias("title"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
                F.lit("u").alias("user_name"),
                F.lit("human").alias("user_type"),
                F.lit(0).alias("old_length"),
                F.col("value").cast("long").alias("new_length"),
            )
        ).alias("value")
    )


def main() -> None:
    spark = get_spark("example-flagship", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"

    # --- batch: decode the wire format and aggregate ---
    payload = events_as_edit_json(spark, sf_dir)
    batch = flagship_transform(decode_edit_events(payload))
    print("batch top windows:")
    batch.orderBy(F.desc("edit_size")).show(5, truncate=False)

    # --- streaming: same transform, file source, availableNow ---
    tmp = tempfile.mkdtemp(prefix="flagship-example-")
    src = os.path.join(tmp, "src")
    payload.coalesce(1).write.mode("overwrite").text(src)
    sink = MemorySink()
    q = build_flagship_stream(
        spark, file_source(spark, src), sink, checkpoint_dir=os.path.join(tmp, "ck")
    )
    q.awaitTermination()
    print(f"streaming emitted {len(sink.rows)} window rows (append mode holds "
          f"the final unfinalized windows back — batch sees them all)")


if __name__ == "__main__":
    main()
