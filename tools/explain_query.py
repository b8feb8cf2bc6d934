"""Print the optimized + physical plan for any registry query:

    python tools/explain_query.py q_asof_join [sf_dir] [mode]

mode: simple (default) | formatted | extended | cost
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_wikipedia_spark.plans import REGISTRY  # noqa: E402
from flink_wikipedia_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in REGISTRY:
        print(f"usage: explain_query.py <query> [sf_dir] [mode]\n"
              f"queries: {', '.join(sorted(REGISTRY))}")
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mode = sys.argv[3] if len(sys.argv) > 3 else "simple"
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[name].fn(spark, sf_dir)
    print(
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
