"""Benchmark harness (driver contract): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a `noop` write — full execution of the plan
(scans, shuffles, aggregates) with zero sink/driver-transfer cost, so
the number measures the engine, not result shipping.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_wikipedia_spark.plans import REGISTRY  # noqa: E402
from flink_wikipedia_spark.session import get_spark  # noqa: E402


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    per_query: dict[str, float] = {}
    for name, qd in REGISTRY.items():
        t0 = time.perf_counter()
        qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
