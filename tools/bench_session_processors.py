"""Sessionizer throughput: per-key vs hash-bucketed processor, at the
HARNESS level (fake handle, no Spark session).

Why harness-level: the end-to-end transformWithState leg is
environment-blocked in this sandbox (google.protobuf absent — the
engine's Python↔JVM state protocol needs it; probe transcripts in
SCALE.md). What bucketing buys is PYTHON-side per-group-call
amortization — fewer Arrow round trips and state lookups per trigger —
and the per-call Python cost is exactly what this harness measures:
N_KEYS domains × EVENTS_PER_KEY events split into BATCHES triggers,
driven through handleInputRows/handleExpiredTimer the way the engine
would. The state-store side of the equation is already quantified by
the totals twin's real-stream sweep (logs_r10/stream_sf100_b*.json).

Usage:
    python tools/bench_session_processors.py [out.json]
        [--keys 20000] [--batches 10] [--events-per-key 20]
        [--buckets 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

GAP_MS = 1_800_000
BASE_MS = 1_700_000_000_000


class _State:
    def __init__(self):
        self.v = None

    def get(self):
        return self.v

    def update(self, t):
        self.v = tuple(t)

    def clear(self):
        self.v = None


class _Handle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _State())

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


class _TimerValues:
    def __init__(self, wm):
        self.wm = wm

    def getCurrentWatermarkInMs(self):
        return self.wm

    def getCurrentProcessingTimeInMs(self):
        return self.wm


class _Expired:
    def __init__(self, ms):
        self.ms = ms

    def getExpiryTimeInMs(self):
        return self.ms


def gen_batches(n_keys: int, n_batches: int, events_per_key: int):
    """Per batch: every key gets events_per_key/n_batches events, time
    advancing so sessions split roughly once mid-stream."""
    import numpy as np

    rng = np.random.default_rng(42)
    per_batch = max(1, events_per_key // n_batches)
    batches = []
    t = 0
    for _ in range(n_batches):
        keys = np.repeat(np.arange(n_keys), per_batch)
        offs = t + rng.integers(0, GAP_MS // 2, size=len(keys))
        sizes = rng.integers(0, 1000, size=len(keys))
        batches.append((keys, offs, sizes))
        t += GAP_MS  # next batch starts a fresh session for every key
    return batches


def pdf_of(keys, offs, sizes, with_domain: bool):
    d = {
        "ts": pd.to_datetime(BASE_MS + offs, unit="ms"),
        "old_length": 0,
        "new_length": sizes,
    }
    out = pd.DataFrame(d)
    if with_domain:
        out["domain"] = pd.Series(keys).map(lambda k: f"u{k}")
    return out


def run_per_key(batches, n_keys):
    from flink_wikipedia_spark.streaming.stateful_v2 import _SessionGapProcessor

    procs = {}
    n_sessions = 0
    t0 = time.perf_counter()
    wm = 0
    for keys, offs, sizes, in batches:
        order = keys.argsort(kind="stable")
        keys, offs, sizes = keys[order], offs[order], sizes[order]
        tv = _TimerValues(BASE_MS + wm)
        df = pdf_of(keys, offs, sizes, with_domain=False)
        # one handleInputRows call per key — what the engine does
        bounds = list(range(0, len(keys) + 1))
        import numpy as np

        cut = np.searchsorted(keys, np.arange(n_keys + 1))
        for k in range(n_keys):
            lo, hi = cut[k], cut[k + 1]
            if lo == hi:
                continue
            key = (f"u{k}",)
            if k not in procs:
                p = _SessionGapProcessor(GAP_MS)
                h = _Handle()
                p.init(h)
                procs[k] = (p, h)
            p, h = procs[k]
            for out in p.handleInputRows(key, iter([df.iloc[lo:hi]]), tv):
                n_sessions += len(out)
        wm = int(offs.max())
        for k, (p, h) in procs.items():
            for t in sorted(x for x in h.timers if x <= BASE_MS + wm):
                h.timers.discard(t)
                for out in p.handleExpiredTimer((f"u{k}",), None, _Expired(t)):
                    n_sessions += len(out)
    wall = time.perf_counter() - t0
    return wall, n_sessions


def run_bucketed(batches, n_keys, buckets):
    from flink_wikipedia_spark.streaming.stateful_v2 import (
        _BucketedSessionProcessor,
    )

    procs = {}
    n_sessions = 0
    t0 = time.perf_counter()
    wm = 0
    for keys, offs, sizes in batches:
        bkt = keys % buckets
        order = bkt.argsort(kind="stable")
        keys, offs, sizes, bkt = keys[order], offs[order], sizes[order], bkt[order]
        tv = _TimerValues(BASE_MS + wm)
        df = pdf_of(keys, offs, sizes, with_domain=True)
        import numpy as np

        cut = np.searchsorted(bkt, np.arange(buckets + 1))
        for b in range(buckets):
            lo, hi = cut[b], cut[b + 1]
            if lo == hi:
                continue
            if b not in procs:
                p = _BucketedSessionProcessor(GAP_MS)
                h = _Handle()
                p.init(h)
                procs[b] = (p, h)
            p, h = procs[b]
            for out in p.handleInputRows((b,), iter([df.iloc[lo:hi]]), tv):
                n_sessions += len(out)
        wm = int(offs.max())
        for b, (p, h) in procs.items():
            for t in sorted(x for x in h.timers if x <= BASE_MS + wm):
                h.timers.discard(t)
                for out in p.handleExpiredTimer((b,), None, _Expired(t)):
                    n_sessions += len(out)
    wall = time.perf_counter() - t0
    return wall, n_sessions


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--keys", type=int, default=20_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--events-per-key", type=int, default=20)
    ap.add_argument("--buckets", type=int, default=256)
    args = ap.parse_args()

    batches = gen_batches(args.keys, args.batches, args.events_per_key)
    n_events = sum(len(b[0]) for b in batches)
    pk_wall, pk_sessions = run_per_key(batches, args.keys)
    bk_wall, bk_sessions = run_bucketed(batches, args.keys, args.buckets)
    assert pk_sessions == bk_sessions, (
        f"session count diverged: per_key={pk_sessions} bucketed={bk_sessions}"
    )
    rec = {
        "metric": "session_processor_throughput",
        "keys": args.keys,
        "buckets": args.buckets,
        "batches": args.batches,
        "n_events": n_events,
        "n_sessions": pk_sessions,
        "per_key": {"wall_s": round(pk_wall, 2),
                    "ev_per_s": round(n_events / pk_wall)},
        "bucketed": {"wall_s": round(bk_wall, 2),
                     "ev_per_s": round(n_events / bk_wall)},
        "speedup": round(pk_wall / bk_wall, 2),
        "load_before": [round(x, 2) for x in os.getloadavg()[:2]],
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
