"""Compose BENCH_sf1.json — the round-6 scale artifact.

Joins two same-code bench.py runs (sf0.1 and generated sf1, both
median-of-3 with load averages recorded) into one artifact with
per-query wall-clock scaling ratios, flagging anything super-linear
(ratio > 10 for 10× data) for plan review.

Usage:
    python tools/compose_bench_sf1.py <sf01.json> <sf1.json> [out]
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    sf01 = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
    q01, q1 = sf01["queries"], sf1["queries"]
    common = sorted(set(q01) & set(q1))
    ratios = {
        k: round(q1[k] / q01[k], 2) for k in common if q01[k] >= 0.05
    }
    flagged = sorted(
        (k for k, r in ratios.items() if r > 10.0), key=lambda k: -ratios[k]
    )
    if not ratios:
        sys.exit(
            "no comparable queries: the runs share no query that took "
            ">=0.05s at sf0.1 — check the two inputs cover the same suite"
        )
    srt = sorted(ratios.values())
    artifact = {
        "metric": "sf0.1_to_sf1_scaling",
        "data_scale_factor": 10.0,
        "sf0_1": {
            "suite_sec": sf01["value"],
            "n_queries": len(q01),
            "load_avg_1m_5m": sf01["load_avg_1m_5m"],
            "stream_events_per_sec": sf01["stream_events_per_sec"],
            "skew_join": sf01.get("skew_join"),
        },
        "sf1": {
            "suite_sec": sf1["value"],
            "n_queries": len(q1),
            "load_avg_1m_5m": sf1["load_avg_1m_5m"],
            "stream_events_per_sec": sf1["stream_events_per_sec"],
            "skew_join": sf1.get("skew_join"),
        },
        "suite_ratio": round(sf1["value"] / sf01["value"], 2),
        # true median (mean of the two mid elements when even), matching
        # bench.py's convention; the p90 index below is clamped at the
        # LOW end by max(0, ...) (ceil(0.9n)-1 <= n-1 already holds for
        # every n >= 1, so no high-end clamp is needed)
        "median_query_ratio": round(
            (srt[(len(srt) - 1) // 2] + srt[len(srt) // 2]) / 2, 3
        ),
        # nearest-rank p90: index ceil(0.9n)-1 — int(0.9n) is one rank
        # high and degenerates to the MAX when n is divisible by 10
        "p90_query_ratio": srt[max(0, math.ceil(len(srt) * 0.9) - 1)],
        "superlinear_flagged": flagged,
        "per_query_sec_sf1": {k: q1[k] for k in common},
        "per_query_ratio": ratios,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=False)
    print(
        json.dumps(
            {
                "suite_ratio": artifact["suite_ratio"],
                "median_query_ratio": artifact["median_query_ratio"],
                "p90_query_ratio": artifact["p90_query_ratio"],
                "superlinear_flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
