"""CLI — the reference's ``main()`` (``DataStreamJob.java:110-143``) as
``python -m flink_wikipedia_spark``: wire a source and a sink to the
flagship pipeline and run it.

A user of the reference switches like-for-like:

    # the reference's exact job (Kafka in, keyed 5-min windows out):
    python -m flink_wikipedia_spark \
        --source kafka --brokers 192.168.4.130:9092 --topic wikipedia-events \
        --sink parquet --out /data/edits --checkpoint /data/ck

    # dev twin with a socket (nc -lk 9999 and paste events):
    python -m flink_wikipedia_spark --source socket --host localhost --port 9999 \
        --sink console --checkpoint /tmp/ck

    # bounded replay of captured events:
    python -m flink_wikipedia_spark --source file --path /data/events \
        --sink parquet --out /data/out --checkpoint /tmp/ck --once

    # any registered batch query, ad hoc ("--query list" to enumerate):
    python -m flink_wikipedia_spark --job query --query q_tpch_q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --out /data/q1

Differences from the reference, on purpose:
- checkpointing is mandatory (the reference has none and loses
  in-flight windows on failure, SURVEY.md §4.2);
- failures PROPAGATE with a non-zero exit (the reference logs and
  swallows, ``DataStreamJob.java:137-142``);
- the Mongo sink's replace-by-key behavior is available as
  ``--sink upsert`` (UpsertParquetSink keyed on domain+window_start);
  a real Mongo deployment plugs mongo-spark-connector into the same
  foreachBatch seam.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="flink_wikipedia_spark")
    p.add_argument(
        "--job",
        choices=["flagship", "curation", "query"],
        default="flagship",
        help="flagship: the reference's windowed edit-size job; "
        "curation: streaming document curation (quality gate, "
        "watermarked dedup, contamination screen, windowed counts); "
        "query: run one registered batch query (--query NAME) over a "
        "parquet table dir (--sf-dir)",
    )
    p.add_argument("--query", help="query name for --job query (see --query list)")
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="table directory for --job query (parquet per table)",
    )
    p.add_argument(
        "--limit", type=int, default=20, help="rows to print for --job query"
    )
    p.add_argument(
        "--source",
        choices=["kafka", "socket", "file", "rate", "wikipedia_sim"],
    )
    p.add_argument("--brokers", help="kafka bootstrap servers")
    p.add_argument("--topic", default="wikipedia-events")
    p.add_argument("--starting-offsets", default="latest")
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=9999)
    p.add_argument("--path", help="input dir for --source file")
    p.add_argument("--rate", type=int, default=100, help="rows/s for --source rate")
    p.add_argument(
        "--rows-per-batch", type=int, default=500,
        help="rows per micro-batch for --source wikipedia_sim",
    )
    p.add_argument(
        "--splits", type=int, default=1,
        help="wikipedia_sim: simulated topic splits",
    )
    p.add_argument(
        "--split-rates", help="wikipedia_sim: per-split speed ratio, e.g. 10,1"
    )
    p.add_argument(
        "--max-drift-seconds", type=int,
        help="wikipedia_sim: watermark-alignment drift cap across splits "
        "(the reference's withWatermarkAlignment 30s twin)",
    )
    p.add_argument(
        "--benchmark-fps",
        help="curation job: parquet of benchmark fingerprints (column fp) "
        "for the contamination anti-join",
    )
    p.add_argument(
        "--classifier-gate",
        action="store_true",
        help="curation job: also gate on the model-based quality "
        "classifier (operators/text.classifier_score_cols) after the "
        "heuristic rules",
    )
    p.add_argument(
        "--lm-gate",
        action="store_true",
        help="curation job: also gate on the hashed-bigram LM "
        "perplexity cut (operators/text.with_lm_keep) — the quality "
        "triad's third gate",
    )
    p.add_argument("--sink", choices=["parquet", "upsert", "console"], default="console")
    p.add_argument("--out", help="output dir for parquet/upsert sinks")
    p.add_argument("--checkpoint", help="required for streaming jobs")
    p.add_argument("--window", default="5 minutes")
    p.add_argument("--watermark", default="1 second")
    p.add_argument("--mode", choices=["append", "update"], default="append")
    p.add_argument("--once", action="store_true", help="availableNow: drain and exit")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    if args.job == "query":
        return run_batch_query(args)

    # validate BEFORE paying JVM startup
    if not args.source:
        print("--source is required for streaming jobs", file=sys.stderr)
        return 2
    if not args.checkpoint:
        print("--checkpoint is required for streaming jobs", file=sys.stderr)
        return 2
    source_kwargs: dict = {}
    if args.source == "kafka":
        if not args.brokers:
            print("--brokers is required for --source kafka", file=sys.stderr)
            return 2
        source_kwargs = dict(
            brokers=args.brokers,
            topic=args.topic,
            starting_offsets=args.starting_offsets,
        )
    elif args.source == "socket":
        source_kwargs = dict(host=args.host, port=args.port)
    elif args.source == "file":
        if not args.path:
            print("--path is required for --source file", file=sys.stderr)
            return 2
        source_kwargs = dict(path=args.path)
    elif args.source == "rate":
        source_kwargs = dict(rows_per_second=args.rate)
    elif args.source == "wikipedia_sim":
        source_kwargs = dict(rowsPerBatch=args.rows_per_batch)
        if args.splits > 1:
            source_kwargs["splits"] = args.splits
            if args.split_rates:
                source_kwargs["splitRates"] = args.split_rates
            if args.max_drift_seconds is not None:
                source_kwargs["maxDriftSeconds"] = args.max_drift_seconds

    if args.sink in ("parquet", "upsert") and not args.out:
        print("--out is required for parquet/upsert sinks", file=sys.stderr)
        return 2

    from flink_wikipedia_spark.session import get_spark
    from flink_wikipedia_spark.streaming.pipeline import (
        build_curation_stream,
        build_flagship_stream,
    )
    from flink_wikipedia_spark.streaming.sinks import (
        ParquetSink,
        RetrySink,
        UpsertParquetSink,
    )
    from flink_wikipedia_spark.streaming.sources import streaming_source

    spark = get_spark("flink-wikipedia-spark-cli")

    if args.sink == "parquet":
        sink = ParquetSink(args.out)
    elif args.sink == "upsert":
        sink = UpsertParquetSink(args.out, key_cols=["domain", "window_start"])
    else:
        def sink(batch_df, epoch_id):  # console
            print(f"--- epoch {epoch_id} ---")
            batch_df.show(50, truncate=False)

    emitted = {"rows": 0, "batches": 0}
    # sink retries mirror the reference's MongoSink.setMaxRetries(3)
    # (DataStreamJob.java:131); composes with the idempotent sinks above
    inner_sink = RetrySink(sink, max_retries=3)

    def counting_sink(batch_df, epoch_id):
        # persist: the count AND the sink both consume the batch — without
        # it the whole micro-batch plan would execute twice per epoch
        batch_df.persist()
        try:
            n = batch_df.count()
            emitted["rows"] += n
            emitted["batches"] += 1
            inner_sink(batch_df, epoch_id)
        finally:
            batch_df.unpersist()

    trigger = {"availableNow": True} if args.once else {"processingTime": "5 seconds"}
    if args.job == "curation":
        bench_fps = (
            spark.read.parquet(args.benchmark_fps) if args.benchmark_fps else None
        )
        query = build_curation_stream(
            spark,
            streaming_source(spark, args.source, **source_kwargs),
            counting_sink,
            checkpoint_dir=args.checkpoint,
            benchmark_fps=bench_fps,
            watermark=args.watermark,
            window_duration=args.window,
            classifier_gate=args.classifier_gate,
            lm_gate=args.lm_gate,
        )
    else:
        query = build_flagship_stream(
            spark,
            streaming_source(spark, args.source, **source_kwargs),
            counting_sink,
            checkpoint_dir=args.checkpoint,
            trigger=trigger,
            output_mode=args.mode,
            watermark=args.watermark,
            window_duration=args.window,
        )
    # Propagate failures (non-zero exit) — deliberately NOT the
    # reference's swallow-and-exit-zero behavior.
    query.awaitTermination()
    print(
        f"emitted {emitted['rows']} window rows over {emitted['batches']} batches",
        file=sys.stderr,
    )
    if args.once and args.mode == "append" and emitted["rows"] == 0:
        print(
            "note: append mode only emits windows the watermark has passed; "
            "a single drained batch finalizes nothing. Use --mode update to "
            "see provisional results with --once.",
            file=sys.stderr,
        )
    return 0


def run_batch_query(args: argparse.Namespace) -> int:
    """--job query: run one registered batch query over a parquet table
    dir — the ad-hoc path for every operator in plans/ (same registry
    the driver contract exposes). ``--query list`` prints the names;
    ``--out`` writes parquet, otherwise the first --limit rows print."""
    from flink_wikipedia_spark.plans import REGISTRY

    if not args.query or args.query == "list":
        for name in REGISTRY:
            print(name)
        return 0 if args.query else 2
    if args.query not in REGISTRY:
        print(
            f"unknown query {args.query!r} — run --job query --query list",
            file=sys.stderr,
        )
        return 2

    from flink_wikipedia_spark.session import get_spark

    spark = get_spark("flink-wikipedia-spark-cli")
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {spark.read.parquet(args.out).count()} rows to {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
