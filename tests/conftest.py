from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_wikipedia_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_MASTER lets the whole suite rerun under a multi-JVM
    # master (local-cluster[N,cores,memMB]) — real serialized exchanges,
    # remote broadcasts, separate Python workers — without code changes.
    # Default stays the fast single-JVM local[8].
    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    s = get_spark("tests", master=master, shuffle_partitions=8)
    yield s
