"""Compose VERIFY_sf100.txt from the incremental sf100 gate batch logs.

The sf100 gate runs as several background batches (the full 130-query
registry at once would serialize ~6 h of Spark+DuckDB work into one
process; batching by source table lets light document/embedding batches
overlap the lineitem-heavy ones). Each batch appends ``ok``/``FAIL``
lines; this script merges them, keeping the LATEST status per query
(earlier resource-tuning failures that later re-ran green — e.g. the
q_minhash_dedup_pairs DuckDB spill before the MATERIALIZED-stage oracle
fix — are superseded), and writes the consolidated artifact.
"""

from __future__ import annotations

import re
import sys

LOGS = [
    # chronological: later entries supersede earlier ones
    ".scratch/logs/verify_sf100_wide.out",
    ".scratch/logs/verify_sf100_retry.out",
    ".scratch/logs/verify_sf100_b3.out",
    ".scratch/logs/verify_sf100_b4_light.out",
    ".scratch/logs/verify_sf100_b4_events.out",
    ".scratch/logs/verify_sf100_b4_heavy.out",
    ".scratch/logs/verify_sf100_b4_heavy2.out",
    ".scratch/logs/verify_sf100_b4_heavy3.out",
    ".scratch/logs/verify_sf100_b5.out",
    ".scratch/logs/verify_sf100_pagerank.out",
    ".scratch/logs/verify_sf100_pagerank2.out",
    ".scratch/logs/verify_sf100_pagerank3.out",
]

LINE = re.compile(r"^(ok|FAIL)\s+(q_\w+):(.*)$")


def main() -> int:
    latest: dict[str, tuple[str, str]] = {}
    order: list[str] = []
    for path in LOGS:
        try:
            fh = open(path, errors="ignore")
        except OSError:
            continue
        with fh:
            for line in fh:
                m = LINE.match(line.strip())
                if not m:
                    continue
                status, name, rest = m.groups()
                if name not in latest:
                    order.append(name)
                latest[name] = (status, rest.strip())
    ok = [n for n in order if latest[n][0] == "ok"]
    fail = [n for n in order if latest[n][0] == "FAIL"]
    rows_only = [n for n in ok if "rows-only" in latest[n][1]]
    with open("VERIFY_sf100.txt", "w") as out:
        out.write(
            "# sf100 oracle gate (counts: lineitem 600M, orders 150M, "
            "events 100M, customer 15M, part 20M, documents 5M, "
            "embeddings 2M; seed 42, tools/gen_sf.py)\n"
            "# merged from batch logs by tools/compose_verify_sf100.py; "
            "latest status per query wins\n\n"
        )
        for n in order:
            status, rest = latest[n]
            out.write(f"{status:<4} {n}: {rest}\n")
        out.write(
            f"\n{len(ok)}/{len(latest)} pass "
            f"({len(ok) - len(rows_only)} value-match, "
            f"{len(rows_only)} rows-only-by-contract"
            + (f"; FAIL: {', '.join(fail)}" if fail else "")
            + ")\n"
        )
    print(f"{len(ok)}/{len(latest)} pass; fails: {fail or 'none'}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
