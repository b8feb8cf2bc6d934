"""Pipeline telemetry via ``DataFrame.observe`` — data-quality counters
collected DURING the job's own pass, not by re-scanning.

The reference has no observability at all (it even swallows job-level
exceptions, ``DataStreamJob.java:137-142``); a 100 TB pipeline cannot
afford the alternative people reach for first — a second ``count()``
per stage, which re-executes the plan. ``observe`` attaches named
aggregate expressions to a point in the plan; Spark evaluates them as
accumulator-style metrics while the action runs, at zero extra scans.

Batch: read metrics from the returned Observation after an action.
Streaming: the same named metrics arrive per micro-batch in
``StreamingQueryProgress.observedMetrics`` — the hook a production
monitor consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_METRICS = "decode_metrics"
QUALITY_METRICS = "quality_metrics"


def observe_decode_health(decoded: DataFrame, name: str = DECODE_METRICS):
    """Attach corrupt-record / null-timestamp counters to a decoded
    frame (the health of reference O2's seam). Returns (df, observation)
    for batch frames; streaming frames return (df, None) — read the
    named metrics from StreamingQueryProgress instead."""
    metrics = [
        F.count(F.lit(1)).alias("rows_total"),
        F.count("_corrupt_record").alias("rows_corrupt"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias("rows_null_ts"),
    ]
    if decoded.isStreaming:
        return decoded.observe(name, *metrics), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return decoded.observe(obs, *metrics), obs


def observe_quality_gate(scored: DataFrame, name: str = QUALITY_METRICS):
    """Attach kept/dropped counters to a quality-scored document frame
    (expects the ``keep`` column from operators/text.quality_score_cols).
    One pass answers 'how much did the gate cut?' — the number every
    curation run reports."""
    metrics = [
        F.count(F.lit(1)).alias("docs_total"),
        F.sum("keep").alias("docs_kept"),
        F.sum(F.lit(1) - F.col("keep")).alias("docs_dropped"),
    ]
    if scored.isStreaming:
        return scored.observe(name, *metrics), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return scored.observe(obs, *metrics), obs
