"""Compute the 50-slot driver correctness window for the next round.

The driver's correctness gate verifies the FIRST 50 registry entries
(see ``plans/__init__.py``), so the ``_PRIORITY`` list there encodes
which queries get fresh driver evidence each round. The STANDING
WINDOW POLICY (plans/__init__.py:20-33) was applied by hand against
the CORRECTNESS_r*.json history every round; this tool makes the
rotation mechanical and auditable:

  1. flagship ``q_windowed_edit_size`` is always slot 1;
  2. names with NO driver record at all (new queries) come next —
     a registered query with zero driver evidence is the stalest
     possible evidence;
  3. names whose implementation changed this round (``--changed``)
     come next — changed code with only stale evidence is untested;
  4. one anchor per operator family stays in-window every round;
  5. remaining slots refresh the stalest evidence first (newest
     driver round per name, ascending; ties alphabetical).

Usage::

    python tools/rotate_window.py [--changed name ...] [--repo DIR]

Prints the 50-name window as a Python list literal ready to paste as
``_PRIORITY``, followed by a pre-declaration block: the expected gate
outcome (how many in-window names are oracled vs rows-only-by-design).
Exits non-zero if the registry and history disagree in a way the
policy can't resolve (e.g. a priority name that is not registered).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

FLAGSHIP = "q_windowed_edit_size"

# Rule 4: one anchor per operator family, held in-window every round so
# a family regression can never hide behind rotation. The first six
# mirror the hand-maintained set used in rounds 8-11; the r14 rotation
# exposed that the families added since (similarity, relational, TPC-H,
# window functions, iterative graph, streaming twins — all checked by
# tests/test_plan_audit.py's semantic invariant) had NO structural
# anchor, so a purely staleness-driven window could leave them
# unrepresented. One canonical anchor per semantic family makes the
# invariant hold by construction instead of by rule-5 luck.
FAMILY_ANCHORS = [
    "q_filter_events",           # core
    "q_json_extract",            # core / JSON
    "q_word_count",              # text
    "q_pii_redact",              # curation
    "q_dedup_docs_exact",        # dedup
    "q_multimodal_decode",       # multimodal
    "q_similarity_lsh",          # similarity / ANN
    "q_join_orders_customer",    # relational joins
    "q_tpch_q1_pricing_summary", # TPC-H suite
    "q_rank_functions",          # analytic window functions
    "q_dedup_components",        # iterative graph
    "q_keyby_agg_edit_size",     # streaming twin
]

WINDOW = 50


def load_history(repo: str) -> dict[str, int]:
    """Newest driver round per query name from CORRECTNESS_r*.json."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, rec in rows.items():
            # ADVICE r12: only a PASSING record is fresh evidence — a
            # failed run must not deprioritize the name next round.
            # Passing = hash-green, or the designed rows-only outcome
            # (err == 'no_oracle' with a recorded row count).
            ok = rec.get("hash_match") is True or (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
            )
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def load_registry() -> dict[str, bool]:
    """name -> has_oracle for every registered query (aliases included:
    they are part of the driver contract and can hold window slots)."""
    from flink_wikipedia_spark.plans import REGISTRY

    return {name: qd.oracle is not None for name, qd in REGISTRY.items()}


def rotate(
    registry: dict[str, bool],
    newest: dict[str, int],
    changed: list[str],
) -> list[str]:
    unknown = [n for n in changed if n not in registry]
    if unknown:
        raise SystemExit(f"--changed names not in registry: {unknown}")
    for n in [FLAGSHIP, *FAMILY_ANCHORS]:
        if n not in registry:
            raise SystemExit(f"anchor not in registry: {n}")

    never_checked = sorted(n for n in registry if n not in newest)
    stale_order = sorted(
        (n for n in registry if n in newest), key=lambda n: (newest[n], n)
    )

    window: list[str] = []
    seen: set[str] = set()

    def take(names: list[str]) -> None:
        for n in names:
            if n not in seen and len(window) < WINDOW:
                window.append(n)
                seen.add(n)

    take([FLAGSHIP])          # rule 1
    take(never_checked)       # rule 2
    take(sorted(changed))     # rule 3
    take(FAMILY_ANCHORS)      # rule 4
    take(stale_order)         # rule 5
    if len(window) != WINDOW:
        raise SystemExit(
            f"registry has only {len(window)} names; window needs {WINDOW}"
        )
    return window


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--changed", nargs="*", default=[],
                    help="query names whose builders changed this round")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    registry = load_registry()
    newest = load_history(args.repo)
    window = rotate(registry, newest, args.changed)

    print("_PRIORITY = [")
    for n in window:
        vintage = f"r{newest[n]}" if n in newest else "NEW (no driver row)"
        print(f'    "{n}",  # {vintage}')
    print("]")

    rows_only = [n for n in window if not registry[n]]
    print()
    print(f"# PRE-DECLARATION: {WINDOW - len(rows_only)}/{WINDOW} expected "
          f"hash-green; {len(rows_only)} rows-only-by-design in-window:")
    for n in rows_only:
        print(f"#   {n}")


if __name__ == "__main__":
    main()
