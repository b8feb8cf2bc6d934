"""Determinism under task retry — the 100 TB failure mode local runs
never see by accident.

On a large cluster some fraction of tasks ALWAYS retries (spot
preemption, executor OOM, shuffle-fetch failure), and Spark recomputes
the lost partition from lineage. Any per-row decision that is not a
pure function of row content (``rand()``, partition-seeded
``df.sample``, ``monotonically_increasing_id`` used as a key) can
diverge between the first attempt and the recompute, silently
corrupting results that no same-process rerun will ever reproduce.
The engine's determinism rules (md5-derived draws in
q_stratified_sample / q_shuffle_shards, content-hash keys everywhere —
see SCALE.md) exist for exactly this; here we PROVE the property by
injecting a first-attempt task failure and asserting byte-identical
results.

Local mode defaults to ``spark.task.maxFailures=1`` (any task failure
kills the job), so the retry run needs its own ``local[4, 2]`` master —
hence a subprocess with its own SparkSession, mirroring
tests/test_examples.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys

sys.path.insert(0, "@REPO@")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flink_wikipedia_spark.schemas import load_table

# local[4, 2]: 4 threads, maxFailures=2 — one retry per task allowed
spark = (
    SparkSession.builder.master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .appName("retry-determinism")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.001"


def pipeline(docs):
    # the engine's md5-draw sampling + a content-derived aggregate:
    # every per-row decision is a pure function of row content, so a
    # recomputed partition must reproduce its rows exactly
    draw = F.conv(F.substring(F.md5(F.concat(F.lit("s|"), F.col("doc_id"))), 1, 15), 16, 10).cast("bigint")
    kept = docs.filter((draw % 100) < 40)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
            F.sum(draw % 1000003).alias("draw_check"),
        )
    )


def flaky_first_attempt(it):
    # fail partition 1's FIRST attempt after consuming input — the
    # retry (attemptNumber > 0) passes rows through untouched
    from pyspark import TaskContext

    tc = TaskContext.get()
    for pdf in it:
        yield pdf
    if tc.partitionId() == 1 and tc.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")


docs = load_table(spark, SF, "documents").repartition(4, "doc_id")
clean = sorted(map(tuple, pipeline(docs).collect()))

flaky_docs = docs.mapInPandas(flaky_first_attempt, docs.schema)
retried = sorted(map(tuple, pipeline(flaky_docs).collect()))

assert clean, "empty result frame"
assert clean == retried, f"retry changed results:\n{clean}\nvs\n{retried}"
print(f"RETRY-DETERMINISM-OK rows={len(clean)}")
spark.stop()
"""


def test_results_identical_under_injected_task_retry():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.replace("@REPO@", REPO)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"exited {proc.returncode}\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )
    assert "RETRY-DETERMINISM-OK" in proc.stdout
    # the injected failure must actually have fired — otherwise the
    # test silently degrades to a plain rerun comparison
    assert "injected first-attempt failure" in proc.stderr, (
        "task failure was not injected (attempt path never ran)"
    )
