"""Headliner scale bench: time a family-spanning query subset at an
arbitrary SF directory (the tool behind the sf1→sf10→sf100 rows in
SCALE.md's scale-gates table).

Usage:
    python tools/bench_headliners.py SF_DIR [q_name ...]
    # default query set: HEADLINERS below

Protocol: one generic JVM warm-up, then each query runs TWICE
back-to-back — the first (cold) pays code-gen + file-listing + any
driver-side index build; the second (warm) is the steady-state number
comparable across SFs (matches the warm-median convention the sf1→sf10
row used). Every run is forced with a `noop` write, same as bench.py —
full plan execution, zero result-shipping cost. Output: one JSON line
    {"sf_dir": ..., "queries": {name: {"cold": s, "warm": s}},
     "total_warm": s, "load_avg": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_wikipedia_spark.plans import REGISTRY  # noqa: E402
from flink_wikipedia_spark.session import get_spark  # noqa: E402

# One per family that stresses a distinct 100 TB shape: windowed agg,
# decimal-heavy agg, multi-join semi/anti, star join, window top-k,
# hash dedup, MinHash banding, capped LSH pairing, IVF-cell semantic
# dedup, trained ANN + refine, brute-force cosine top-k, stride-1 span
# hashing, iterative components, and the multi-stage curation capstone.
HEADLINERS = [
    "q_windowed_edit_size",
    "q_tpch_q1_pricing_summary",
    "q_tpch_q9_nation_year_profit",
    "q_tpch_q21_sole_late_supplier",
    "q_join_orders_customer",
    "q_topk_docs_per_lang",
    "q_dedup_docs_exact",
    "q_minhash_dedup_pairs",
    "q_embedding_neardup_lsh",
    "q_semantic_dedup",
    "q_ann_ivfpq_refined",
    "q_similarity_topk",
    "q_duplicate_spans",
    "q_span_mask_stats",
    "q_dedup_components",
    "q_curation_funnel",
]


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 3)


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--out=")]
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--out=")),
        None,
    )
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    names = argv[1:] or HEADLINERS
    spark = get_spark("bench-headliners")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, dict[str, float]] = {}

    def payload() -> str:
        return json.dumps(
            {
                "sf_dir": sf_dir,
                "queries": out,
                "total_warm": round(
                    sum(v.get("warm", 0.0) for v in out.values()), 3
                ),
                "load_avg": [round(x, 2) for x in os.getloadavg()],
            }
        )

    for name in names:
        # A query can die for environment reasons (the sf100 run hit
        # local-disk exhaustion mid-shuffle): record the failure and keep
        # going rather than losing the rest of the suite.
        try:
            cold = run_once(spark, name, sf_dir)
            warm = run_once(spark, name, sf_dir)
            out[name] = {"cold": cold, "warm": warm}
            print(f"  {name}: cold {cold} s, warm {warm} s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — bench must survive
            msg = str(exc).splitlines()[0][:200] if str(exc) else type(exc).__name__
            out[name] = {"error": msg}
            print(f"  {name}: FAILED {msg}", file=sys.stderr)
        spark.catalog.clearCache()
        if out_path:
            # Flush after every query so a killed multi-hour run (the
            # sf100 suite) still leaves its completed measurements.
            tmp = out_path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(payload() + "\n")
            os.replace(tmp, out_path)
    print(payload())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
