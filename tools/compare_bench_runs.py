"""Compare N bench.py runs and pick the anchor (round-9 protocol).

The judge's re-baseline recipe: run bench.py several times at different
times, record load before/after each, keep the LOWEST-LOAD run as the
anchor, and show drift of the others against it (<±20% = same-machine
noise).

    python tools/compare_bench_runs.py run1.json run2.json [run3.json...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs = []
    for p in sys.argv[1:]:
        d = json.load(open(p))
        # BEFORE-load is the contamination discriminator: the after-load
        # is dominated by the bench's own 32-thread work (any healthy
        # run ends at 2-5), but a loaded start means a co-tenant.
        lb = d.get("load_avg_before")
        load = lb[0] if lb else d.get("load_avg_1m_5m", [99])[0]
        runs.append((p, d, load))
    runs.sort(key=lambda r: r[2])
    anchor_path, anchor, _ = runs[0]
    qa = anchor["queries"]
    print(f"anchor (lowest load): {anchor_path}")
    print(
        f"  suite {anchor['value']}s / {len(qa)} queries = "
        f"{anchor['value']/len(qa):.3f} s/query, "
        f"load before {anchor.get('load_avg_before')} after {anchor['load_avg_1m_5m']}, "
        f"stream {anchor['stream_events_per_sec']} ev/s"
    )
    for p, d, _ in runs[1:]:
        qd = d["queries"]
        common = [k for k in qa if k in qd and qa[k] >= 0.05]
        drift = d["value"] / anchor["value"]
        per_q = sorted(qd[k] / qa[k] for k in common)
        med = per_q[len(per_q) // 2]
        outliers = sorted(
            ((k, round(qd[k] / qa[k], 2)) for k in common if qd[k] / qa[k] > 1.5),
            key=lambda kv: -kv[1],
        )[:8]
        print(
            f"{p}: suite {d['value']}s ({drift:.2f}x anchor), per-query median "
            f"{med:.2f}x, load before {d.get('load_avg_before')} "
            f"after {d['load_avg_1m_5m']}, stream {d['stream_events_per_sec']}"
        )
        if outliers:
            print(f"  >1.5x: {outliers}")


if __name__ == "__main__":
    main()
