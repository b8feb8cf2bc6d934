"""Pinned streaming chaos gate (round-10 verdict item 4): SIGKILL the
DRIVER process mid-backlog on the stream-stream interval join, resume
from the RocksDB checkpoint, and the union of published epochs must
equal the batch twin as an exact multiset — no loss, no duplication.

Complements test_chaos_kill (executor death, batch) and the flagship's
injected-exception kill (test_streaming): this one kills the whole
driver JVM+Python with no cleanup, the failure mode a real cluster
restart presents. The sf100 logged run is recorded in SCALE.md.

Runs tools/chaos_stream_resume.py as a subprocess: the kill must be a
real process kill, which can't happen inside the suite's interpreter."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_sigkill_stream_resume_matches_batch_twin(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "tools", "chaos_stream_resume.py"),
            "/root/testdata/sf0.1",
            "--work",
            str(tmp_path / "chaos_stream"),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=_REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"gate failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "killed driver (SIGKILL)" in proc.stdout
    assert "ok: kill/resume parity holds" in proc.stdout
