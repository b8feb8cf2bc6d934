"""Driver kill-and-resume gate for the stream-stream interval join.

Round-9 measured the sf100 stream-stream join's throughput (398.6 K
ev/s, 3.0 GB versioned RocksDB checkpoint) but its kill/resume parity
proof existed only at small SF via an injected sink exception. This
tool does the real thing at any SF: SIGKILL the ENTIRE driver process
(JVM + Python, no cleanup, no atexit) mid-backlog, restart from the
checkpoint, and assert the union of published epochs equals the batch
twin exactly — no loss, no duplication.

    python tools/chaos_stream_resume.py <sf_dir> [--kill-epochs K]
        [--events CAP] [--work DIR] [--out JSON]

Phases (each its own interpreter, so the kill is a process kill):
  render — events table → ts-ordered JSON slabs (reuses
           bench_stream_pipelines.render_events; ~20 slabs replayed as
           event-time-ordered micro-batches via maxFilesPerTrigger=1);
  stream — purchases ⋈ preceding-hour views per user
           (stateful.purchases_with_recent_views), RocksDB store,
           epoch-keyed ParquetSink (a replayed epoch overwrites itself);
  verify — batch twin (same decode + interval-join predicate on the
           same rendered slabs) compared as an exact multiset.

The parent orchestrates: render → stream (SIGKILL at --kill-after) →
assert the kill landed mid-backlog (committed epochs > 0 AND < slab
count) → stream again to completion → verify. Exit 0 iff all gates
hold. The mid-backlog assertion matters: a kill after the last commit
would "pass" while proving nothing (the round-9 chaos-calibration
lesson).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOIN_WITHIN = "1 hour"


def committed_epochs(ck_dir: str) -> int:
    commits = os.path.join(ck_dir, "commits")
    if not os.path.isdir(commits):
        return 0
    return len([f for f in os.listdir(commits) if not f.startswith(".")])


# ---------------------------------------------------------------- phases


def phase_render(sf_dir: str, work: str, cap: int | None) -> None:
    from flink_wikipedia_spark.session import get_spark

    import bench_stream_pipelines as bsp

    spark = get_spark("chaos-stream-render")
    spark.sparkContext.setLogLevel("ERROR")
    n = bsp.render_events(spark, sf_dir, os.path.join(work, "events_json"), cap)
    with open(os.path.join(work, "n_events.txt"), "w") as fh:
        fh.write(str(n))
    print(f"rendered {n} events", flush=True)


def _split_streams(decoded):
    from pyspark.sql import functions as F

    return (
        decoded.filter(F.col("title") == "purchase"),
        decoded.filter(F.col("title") == "view"),
    )


def phase_stream(work: str) -> None:
    from flink_wikipedia_spark.operators.core import decode_edit_events
    from flink_wikipedia_spark.session import get_spark
    from flink_wikipedia_spark.streaming.sinks import ParquetSink
    from flink_wikipedia_spark.streaming.sources import file_source
    from flink_wikipedia_spark.streaming.stateful import (
        purchases_with_recent_views,
    )

    spark = get_spark("chaos-stream-join")
    spark.sparkContext.setLogLevel("ERROR")
    decoded = decode_edit_events(
        file_source(spark, os.path.join(work, "events_json"),
                    max_files_per_trigger=1)
    )
    purchases, views = _split_streams(decoded)
    joined = purchases_with_recent_views(purchases, views, within=JOIN_WITHIN)
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(ParquetSink(os.path.join(work, "out")))
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("STREAM_COMPLETE", flush=True)


def phase_verify(work: str, out_json: str | None) -> int:
    import pandas as pd

    from flink_wikipedia_spark.operators.core import decode_edit_events
    from flink_wikipedia_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("chaos-stream-verify")
    spark.sparkContext.setLogLevel("ERROR")
    got_df = spark.read.parquet(os.path.join(work, "out"))

    # two scans of the rendered text (one per side) — cheaper and
    # simpler than checkpointing the 100 M-row decode at sf100
    decoded = decode_edit_events(
        spark.read.text(os.path.join(work, "events_json"))
    )
    purchases, views = _split_streams(decoded)
    l = purchases.select(
        F.col("domain").alias("l_domain"),
        F.col("ts").alias("l_ts"),
        F.col("new_length").alias("l_new_length"),
    )
    r = views.select(
        F.col("domain").alias("r_domain"),
        F.col("ts").alias("r_ts"),
        F.col("new_length").alias("r_new_length"),
    )
    want_df = l.join(
        r,
        (F.col("l_domain") == F.col("r_domain"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {JOIN_WITHIN}"))
        & (F.col("r_ts") < F.col("l_ts")),
        "inner",
    )

    cols = ["l_domain", "l_ts", "l_new_length", "r_ts", "r_new_length"]

    def multiset(df) -> pd.DataFrame:
        pdf = df.select(cols).toPandas()
        return pdf.sort_values(cols, ignore_index=True)

    got, want = multiset(got_df), multiset(want_df)
    ok = len(got) == len(want) and got.equals(want)
    rec = {
        "streamed_rows": len(got),
        "batch_twin_rows": len(want),
        "multiset_equal": bool(ok),
    }
    print(json.dumps(rec), flush=True)
    if out_json:
        with open(out_json, "a") as fh:
            fh.write(json.dumps({"verify": rec}) + "\n")
    return 0 if ok else 1


# ------------------------------------------------------------ orchestrator


def child(
    phase: str,
    args: list[str],
    kill_at_epochs: int | None = None,
    ck_dir: str | None = None,
):
    """Run a phase in its own interpreter. With kill_at_epochs set, poll
    the checkpoint's commit log and SIGKILL the driver the moment that
    many epochs have committed — deterministic mid-backlog landing
    regardless of host speed (a fixed sleep raced Spark startup: 10 s
    landed before the first commit at sf0.1)."""
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_STATE_STORE", "rocksdb")
    env["PYTHONPATH"] = (
        REPO + os.pathsep + os.path.join(REPO, "tools")
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase, *args]
    p = subprocess.Popen(cmd, env=env)
    if kill_at_epochs is None:
        p.wait()
        return p.returncode
    while p.poll() is None:
        if committed_epochs(ck_dir) >= kill_at_epochs:
            break
        time.sleep(0.25)
    if p.poll() is not None:  # stream finished before the threshold
        return p.returncode
    # Enumerate the child's direct JVM children BEFORE killing it (pgrep
    # -P scoped to p.pid — never a global pattern: a concurrent bench's
    # JVM must be unkillable from here), SIGKILL python, then the JVMs.
    # Belt-and-suspenders: PySpark's gateway JVM normally self-exits on
    # stdin EOF when its python parent dies, but a leaked 8 GB JVM would
    # poison the resume phase, so we don't rely on it.
    jvms = subprocess.run(
        ["pgrep", "-P", str(p.pid), "java"], capture_output=True, text=True
    ).stdout.split()
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    for pid in jvms:
        try:
            os.kill(int(pid), signal.SIGKILL)
        except (ProcessLookupError, ValueError):
            pass
    time.sleep(2)
    return p.returncode


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?")
    ap.add_argument("--phase", default=None)
    ap.add_argument("--work", default=os.path.join(REPO, ".scratch", "chaos_stream"))
    ap.add_argument("--events", type=int, default=None)
    ap.add_argument(
        "--kill-epochs", type=int, default=None,
        help="SIGKILL the driver once this many epochs committed "
        "(default: slabs // 3)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.phase == "render":
        phase_render(args.sf_dir, args.work, args.events)
        return 0
    if args.phase == "stream":
        phase_stream(args.work)
        return 0
    if args.phase == "verify":
        return phase_verify(args.work, args.out)

    # orchestrator
    import shutil

    work = args.work
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    render_args = [args.sf_dir, "--work", work]
    if args.events:
        render_args += ["--events", str(args.events)]
    rc = child("render", render_args)
    if rc != 0:
        print(f"FAIL: render exited {rc}")
        return 2
    n_slabs = len(
        [f for f in os.listdir(os.path.join(work, "events_json"))
         if f.endswith(".json")]
    )

    kill_epochs = args.kill_epochs or max(1, n_slabs // 3)
    t0 = time.time()
    rc = child(
        "stream", [args.sf_dir, "--work", work],
        kill_at_epochs=kill_epochs, ck_dir=os.path.join(work, "ck"),
    )
    killed_at = time.time() - t0
    epochs_at_kill = committed_epochs(os.path.join(work, "ck"))
    if rc == 0:
        print("FAIL: stream finished before the epoch threshold — kill "
              "never landed; lower --kill-epochs")
        return 2
    if not (0 < epochs_at_kill < n_slabs):
        print(
            f"FAIL: kill not mid-backlog ({epochs_at_kill} committed epochs "
            f"of {n_slabs} slabs)"
        )
        return 2
    print(
        f"killed driver (SIGKILL) at t+{killed_at:.0f}s with "
        f"{epochs_at_kill}/{n_slabs} epochs committed",
        flush=True,
    )

    t1 = time.time()
    rc = child("stream", [args.sf_dir, "--work", work])
    resume_wall = time.time() - t1
    if rc != 0:
        print(f"FAIL: resume exited {rc}")
        return 2
    epochs_final = committed_epochs(os.path.join(work, "ck"))
    print(
        f"resumed from checkpoint: {epochs_final} total epochs, "
        f"resume wall {resume_wall:.0f}s",
        flush=True,
    )

    rc = child("verify", [args.sf_dir, "--work", work]
               + (["--out", args.out] if args.out else []))
    if rc != 0:
        print("FAIL: streamed output != batch twin")
        return 1
    rec = {
        "metric": "stream_stream_join_kill_resume",
        "sf_dir": args.sf_dir,
        "slabs": n_slabs,
        "epochs_at_kill": epochs_at_kill,
        "epochs_final": epochs_final,
        "killed_at_sec": round(killed_at, 1),
        "resume_wall_sec": round(resume_wall, 1),
        "state_store": os.environ.get("SPARK_GRAFT_STATE_STORE", "rocksdb"),
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    print("ok: kill/resume parity holds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
