"""Interleaved A/B of the trained-ANN corpus-encode scorers.

Runs q_ann_ivfpq_refined end-to-end with the expression-fold encoder
("expr") and the Arrow mapInPandas numpy encoder ("numpy"), alternating
runs so machine drift hits both arms equally, and asserts both arms
return identical (query_id, neighbor_id, rk) sets — the scorers must be
result-equivalent, not just both-plausible. Usage:

    python tools/bench_ann_scorer.py [sf_dir] [reps=3]

Prints one JSON line with per-arm medians. Results recorded in SCALE.md;
the winner is registered via ANN_ENCODER in plans/queries_similarity.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_wikipedia_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench-ann-scorer")

    import flink_wikipedia_spark.plans.queries_similarity as qs
    from flink_wikipedia_spark.plans import REGISTRY

    fn = REGISTRY["q_ann_ivfpq_refined"].fn
    # warm both arms once (JIT, index train cache, file cache) so the
    # timed reps measure steady state
    results = {}
    for arm in ("expr", "numpy"):
        qs.ANN_ENCODER = arm
        results[arm] = sorted(
            (r.query_id, r.neighbor_id, r.rk) for r in fn(spark, sf_dir).collect()
        )
    assert results["expr"] == results["numpy"], (
        "scorer arms diverge — the numpy encoder is not result-equivalent "
        "to the expression form on this corpus"
    )
    times: dict[str, list[float]] = {"expr": [], "numpy": []}
    for _ in range(reps):
        for arm in ("expr", "numpy"):  # interleaved: drift hits both arms
            qs.ANN_ENCODER = arm
            t0 = time.time()
            fn(spark, sf_dir).collect()
            times[arm].append(time.time() - t0)
    med = {arm: round(statistics.median(ts), 3) for arm, ts in times.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "median_sec": med,
                "speedup_numpy": round(med["expr"] / med["numpy"], 2),
                "identical_results": True,
                "all_times": {a: [round(t, 3) for t in ts] for a, ts in times.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
