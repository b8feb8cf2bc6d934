"""Golden-file regression lock (SURVEY.md §5.2): the flagship pipeline
over a fixed deterministic replay (wikipedia_sim, 2000 events, seed 42)
must reproduce tests/golden/flagship_golden.json exactly. Any change to
decode, filtering, windowing, or the aggregate that alters results will
fail here before it can silently alter semantics in a later round."""

from __future__ import annotations

import json
import os

import pytest

from flink_wikipedia_spark.operators.core import decode_edit_events
from flink_wikipedia_spark.sources.wikipedia_sim import register
from flink_wikipedia_spark.streaming.pipeline import flagship_transform

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "flagship_golden.json")


def test_flagship_matches_golden(spark):
    register(spark)
    src = spark.read.format("wikipedia_sim").option("rows", 2000).load()
    out = flagship_transform(decode_edit_events(src))
    rows = [
        {
            "domain": r.domain,
            "edit_size": r.edit_size,
            "window_start": r.window_start.isoformat(),
            "window_end": r.window_end.isoformat(),
        }
        for r in out.collect()
    ]
    rows.sort(key=lambda d: (d["domain"], d["window_start"]))
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert rows == golden
