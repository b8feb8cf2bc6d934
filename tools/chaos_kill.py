"""Chaos gate: SIGKILL one executor JVM mid-query under a multi-JVM
master and assert the recomputed result still VALUE-matches the DuckDB
oracle.

Round 8's wedged-JVM incident (SCALE.md) proved the hang path; this
proves the kill/recompute path: a standalone-mode Worker relaunches the
lost executor, Spark re-schedules its failed tasks and regenerates its
lost shuffle outputs, and the final result must be bit-identical to the
oracle — fault tolerance that changes answers is worse than a crash.

Runs as its OWN process (a local-cluster session can't share a JVM with
the test suite's local[8] fixture):

    python tools/chaos_kill.py <sf_dir> <query> [kill_after_frac]

Exit 0 iff (a) at least one executor was killed mid-flight, (b) the
query completed, (c) values match the oracle. The pinned test
(tests/test_chaos_kill.py) drives this at sf0.1; the logged sf10 run is
recorded in SCALE.md.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASTER = os.environ.get("CHAOS_MASTER", "local-cluster[3,4,2048]")


def executor_pids(driver_pid: int, app_id: str) -> list[int]:
    """CoarseGrainedExecutorBackend JVMs of THIS app only. Executor
    cmdlines carry ``--app-id <applicationId>``, so the pgrep pattern is
    scoped to it (ADVICE r9: a bare class-name match would let the
    assassin SIGKILL an executor of a concurrently running Spark app —
    e.g. a verify/bench gate — while this app's query proceeds unkilled
    and the gate result becomes misleading)."""
    out = subprocess.run(
        ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*--app-id {app_id}"],
        capture_output=True,
        text=True,
    ).stdout.split()
    return [int(p) for p in out if int(p) != driver_pid]


def main() -> int:
    sf_dir = sys.argv[1]
    qname = sys.argv[2]
    kill_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35

    import duckdb

    import __spark_entry__ as entrymod
    from flink_wikipedia_spark.schemas import ALL_TABLES
    from flink_wikipedia_spark.session import get_spark

    # Oracle FIRST (no Spark running yet — clean baseline).
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_df = con.sql(entrymod.oracle_sql()[qname]).df()

    spark = get_spark("chaos-kill", master=MASTER)
    spark.sparkContext.setLogLevel("ERROR")

    # Calibration: TWO undisturbed passes of the SAME action the chaos
    # run uses (collect). The first pays codegen/executor spawn; the
    # WARM second pass is what the killed run's pace will match — the
    # first version of this script calibrated cold and the "mid-flight"
    # kill landed after a 3x-faster warm run had already finished.
    def one_pass() -> float:
        t0 = time.perf_counter()
        entrymod.queries()[qname](spark, sf_dir).collect()
        return time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    cold_wall = one_pass()
    base_wall = one_pass()
    n_exec = len(executor_pids(os.getpid(), app_id))
    print(
        f"calibration: {cold_wall:.1f}s cold / {base_wall:.1f}s warm "
        f"undisturbed, {n_exec} executor JVMs"
    )
    if n_exec < 2:
        print("FAIL: need >=2 executors to survive a kill")
        return 2

    killed: list[tuple[int, float]] = []
    t0 = time.perf_counter()

    def assassin() -> None:
        time.sleep(max(0.2, base_wall * kill_frac))
        pids = executor_pids(os.getpid(), app_id)
        if not pids:
            return
        victim = pids[0]
        os.kill(victim, signal.SIGKILL)
        killed.append((victim, time.perf_counter() - t0))
        print(f"killed executor JVM {victim} at t+{killed[0][1]:.1f}s")

    th = threading.Thread(target=assassin, daemon=True)
    th.start()
    sdf = entrymod.queries()[qname](spark, sf_dir)
    rows = sdf.collect()
    wall = time.perf_counter() - t0
    th.join(5)
    if not killed or killed[0][1] >= wall:
        print(
            f"FAIL: kill did not land mid-query (query {wall:.1f}s, kill at "
            f"{killed[0][1]:.1f}s)" if killed
            else "FAIL: query finished before the kill fired — lower kill_frac"
        )
        return 2
    # the worker must have relaunched the executor (or the survivors
    # finished the work); either way the END STATE is what matters:
    import pandas as pd

    spark_pd = pd.DataFrame([r.asDict() for r in rows], columns=sdf.columns)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "verify_local",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "verify_local.py"),
    )
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)

    if sorted(spark_pd.columns) != sorted(oracle_df.columns):
        print(f"FAIL: columns differ {spark_pd.columns} vs {oracle_df.columns}")
        return 1
    if len(spark_pd) != len(oracle_df):
        print(f"FAIL: rows spark={len(spark_pd)} oracle={len(oracle_df)}")
        return 1
    a, b = vl.normalize(spark_pd), vl.normalize(oracle_df)
    if not a.equals(b):
        bad = [c for c in a.columns if not a[c].equals(b[c])]
        print(f"FAIL: values differ in {bad}")
        return 1
    print(
        f"ok: {qname} survived executor SIGKILL (pid {killed[0][0]} at "
        f"t+{killed[0][1]:.1f}s of {wall:.1f}s), {len(spark_pd)} rows "
        f"value-match the oracle (vs {base_wall:.1f}s warm undisturbed)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
