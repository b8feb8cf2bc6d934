"""The examples/ scripts are the engine's narrative front door — they
must keep running as the operator surface evolves. Each is executed as
a real subprocess (its own SparkSession) against the smoke fixture."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    "examples/corpus_dedup.py",
    "examples/flagship_pipeline.py",
    "examples/training_data_pipeline.py",
    "examples/training_data_export.py",
]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs_clean(script):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    assert proc.stdout.strip(), f"{script} printed nothing"
