"""Per-stage forensics for one query: attribute its wall clock to CPU,
GC, shuffle, and spill using the UI REST API's stage table.

Round-9 verdict watch item: at sf100, TPC-H Q1/Q9/Q21 scale ~8-9× for
10× data while the rest of the suite sits at 2-3× — is that shuffle
spill, GC pressure at the 8 GB heap, or genuinely CPU-bound? Wall time
can't answer; per-stage task metrics can:

    SPARK_GRAFT_SF_DIR ignored — pass the dir explicitly:
    python tools/stage_forensics.py <sf_dir> <query> [passes]

Protocol: one cold pass (codegen/JIT, not reported), then `passes`
(default 1) measured passes. Stages are attributed to the measured
passes by snapshotting the stage-id high-water mark between passes.
Emits one JSON document per measured pass:

    {"query": ..., "wall_sec": ..., "stages": [
        {"stage": "...", "tasks": N, "run_sec": ..., "cpu_sec": ...,
         "gc_sec": ..., "shuffle_read_mb": ..., "shuffle_write_mb": ...,
         "spill_mem_mb": ..., "spill_disk_mb": ...,
         "peak_exec_mem_mb": ..., "input_mb": ...,
         "task_p50_sec": ..., "task_max_sec": ...}, ...]}

The verdict reads: spill_*_mb > 0 ⇒ memory pressure (fix = partition
count / heap); gc_sec large vs cpu_sec ⇒ heap churn; cpu_sec ≈ run_sec
with zero spill/GC ⇒ CPU-bound, expected; task_max >> task_p50 ⇒ skew
or straggler, not capacity.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 2**20


def fetch(opener, base: str, path: str):
    with opener.open(f"{base}{path}", timeout=30) as r:
        return json.load(r)


def main() -> int:
    sf_dir, qname = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    os.environ["SPARK_GRAFT_UI"] = "1"
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.plans.registry import release_caches
    from flink_wikipedia_spark.session import get_spark

    spark = get_spark(f"forensics-{qname}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    opener = urllib.request.build_opener(urllib.request.ProxyHandler({}))

    def run_once() -> float:
        t0 = time.perf_counter()
        REGISTRY[qname].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_caches()
        return wall

    cold = run_once()
    print(f"# cold pass {cold:.1f}s (not reported)", file=sys.stderr)

    for p in range(passes):
        seen = {s["stageId"] for s in fetch(opener, base, "/stages")}
        wall = run_once()
        stages = [
            s
            for s in fetch(opener, base, "/stages")
            if s["stageId"] not in seen and s["status"] != "SKIPPED"
        ]
        rows = []
        for s in sorted(stages, key=lambda x: -x.get("executorRunTime", 0)):
            row = {
                "stage": f'{s["stageId"]}: {s.get("name", "")[:70]}',
                "tasks": s.get("numTasks"),
                "run_sec": round(s.get("executorRunTime", 0) / 1e3, 1),
                "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "gc_sec": round(s.get("jvmGcTime", 0) / 1e3, 1),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / MB, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / MB, 1),
                "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / MB, 1),
                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / MB, 1),
                "peak_exec_mem_mb": round(s.get("peakExecutionMemory", 0) / MB, 1),
                "input_mb": round(s.get("inputBytes", 0) / MB, 1),
            }
            try:  # task-time distribution: skew/straggler discriminator
                q = fetch(
                    opener,
                    base,
                    f'/stages/{s["stageId"]}/{s.get("attemptId", 0)}'
                    "/taskSummary?quantiles=0.5,1.0",
                )
                dur = q.get("duration") or q.get("executorRunTime") or []
                if len(dur) == 2:
                    row["task_p50_sec"] = round(dur[0] / 1e3, 1)
                    row["task_max_sec"] = round(dur[1] / 1e3, 1)
            except Exception:
                pass
            rows.append(row)
        doc = {
            "query": qname,
            "sf_dir": sf_dir,
            "pass": p + 1,
            "wall_sec": round(wall, 1),
            "cpu_sec": round(sum(r["cpu_sec"] for r in rows), 1),
            "gc_sec": round(sum(r["gc_sec"] for r in rows), 1),
            "spill_disk_mb": round(sum(r["spill_disk_mb"] for r in rows), 1),
            "spill_mem_mb": round(sum(r["spill_mem_mb"] for r in rows), 1),
            "stages": rows,
        }
        print(json.dumps(doc, separators=(",", ":")), flush=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
