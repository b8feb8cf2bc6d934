"""Pinned chaos gate (round-9 verdict item): kill one executor JVM
mid-query under local-cluster and the recomputed result must still
value-match the DuckDB oracle. Round 8 proved the WEDGED-executor path
(timer interrupt + connection recycle, SCALE.md); this pins the
KILLED-executor path — standalone Worker relaunch + task re-schedule +
shuffle recompute with no answer drift.

Runs tools/chaos_kill.py as a subprocess: a local-cluster session
cannot share a JVM with the suite's local[8] fixture."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_executor_sigkill_preserves_value_parity():
    # q_tpch_q21_sole_late_supplier: long enough at sf0.1 on a 3-worker
    # local-cluster (~10s) that a kill at 35% lands mid-shuffle, with a
    # multi-join plan whose lost map outputs genuinely need recompute.
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "tools", "chaos_kill.py"),
            "/root/testdata/sf0.1",
            "q_tpch_q21_sole_late_supplier",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=_REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"chaos gate failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "survived executor SIGKILL" in proc.stdout
