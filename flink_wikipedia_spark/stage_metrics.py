"""Per-query executor metrics via the Spark UI REST API (snapshot deltas).

Wall time alone cannot distinguish "the host was busy" from "the code
got slower": co-tenant load inflates wall clock ±20 % while executor
CPU time barely moves (the drift signature that cost rounds 8 and 9 a
five-run anchor forensics cycle — BASELINE.md §protocol). This sampler
reads cumulative stage totals from the UI REST endpoint
(``/api/v1/applications/<id>/stages``, served by the same AppStatusStore
that backs the UI) and reports the delta around each query, so every
bench artifact carries its own drift discriminator:

- wall up, CPU flat  → host contention; trust CPU, rerun nothing;
- wall up, CPU up    → the code genuinely does more work;
- shuffle/spill up   → the *plan* changed, not just the machine.

Requires a UI-enabled session (``SPARK_GRAFT_UI=1`` — session.py). When
the UI is off the sampler degrades to unavailable and callers emit
wall-clock-only artifacts, exactly the pre-round-10 format.

Known accounting edges, deliberate:

- Python-worker CPU (pandas UDFs) is NOT in ``executorCpuTime`` — the
  JVM task thread blocks on the worker socket, which burns wall, not
  task CPU. UDF-heavy queries therefore show cpu << wall even on an
  idle box; the drift rule compares a query AGAINST ITSELF across
  rounds, so the offset cancels.
- Status-store updates ride the async listener bus; a few tasks' worth
  of CPU can post after the action returns and land in the next
  query's delta. Harmless at bench granularity.
- Stage eviction (``spark.ui.retainedStages``) would make cumulative
  totals DECREASE; the session factory sizes retention far above a full
  suite, and the sampler marks any observed decrease as invalid rather
  than report a wrong delta.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

# Cumulative per-stage fields summed into the snapshot. Times: ms for
# executorRunTime, ns for executorCpuTime (the REST contract).
FIELDS = (
    "executorRunTime",
    "executorCpuTime",
    "inputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


class StageMetricsSampler:
    """Snapshot-delta reader over the cumulative stage metrics of one
    application. Usage::

        sampler = StageMetricsSampler(spark)
        sampler.snapshot()                # establish the baseline
        ... run one query ...
        d = sampler.delta()               # {"executorCpuTime": ns, ...}

    ``available`` is False when the session has no UI (or any request
    fails); every method then degrades to no-ops returning None —
    instrumentation must never break the bench contract.
    """

    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self._base = sc.uiWebUrl  # None when spark.ui.enabled=false
        self._app = sc.applicationId
        # Direct opener: a stray http_proxy env must not route
        # localhost REST calls through a proxy.
        self._opener = urllib.request.build_opener(
            urllib.request.ProxyHandler({})
        )
        self.available = self._base is not None
        self._last: dict[str, int] | None = None

    def _totals(self) -> dict[str, int] | None:
        if not self.available:
            return None
        url = f"{self._base}/api/v1/applications/{self._app}/stages"
        try:
            with self._opener.open(url, timeout=15) as resp:
                stages = json.load(resp)
        except Exception:
            self.available = False
            return None
        tot = dict.fromkeys(FIELDS, 0)
        for st in stages:
            for f in FIELDS:
                v = st.get(f)
                if v:
                    tot[f] += int(v)
        return tot

    def snapshot(self) -> None:
        """Record the current cumulative totals as the delta baseline."""
        self._last = self._totals()

    def delta(self) -> dict[str, int] | None:
        """Totals accrued since the last snapshot()/delta(); advances
        the baseline. None if unavailable or if eviction made any
        cumulative field decrease (a lying delta is worse than none)."""
        prev, cur = self._last, self._totals()
        self._last = cur
        if prev is None or cur is None:
            return None
        d = {f: cur[f] - prev[f] for f in FIELDS}
        if any(v < 0 for v in d.values()):
            return None
        return d
