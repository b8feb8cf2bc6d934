"""Capture physical plans for representative queries → PLANS.md.

Evidence artifact for the scale claims in SCALE.md: pushdown, pruning,
broadcast choices, partial aggregation, TakeOrderedAndProject, single-
shuffle as-of join. Regenerate after plan-affecting changes:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_wikipedia_spark.plans import REGISTRY  # noqa: E402
from flink_wikipedia_spark.session import get_spark  # noqa: E402

SHOWCASE = {
    "q_filter_events": "filter pushdown + column pruning reach the scan",
    "q_windowed_edit_size": "flagship: partial→final HashAggregate, ONE exchange",
    "q_tpch_q3_shipping_priority": "dims broadcast; top-10 via TakeOrderedAndProject (no global sort)",
    "q_asof_join": "as-of join = ONE hash exchange + window (no nested loop)",
    "q_minhash_dedup_pairs": "capped buckets → LOCAL pair expansion (Generate over array combinations) — no self-join",
    "q_similarity_lsh": "LSH candidates: equi-join on bucket id, no cross product",
    "q_tpch_q7_volume_shipping": "5-way star: every dim broadcast (nation twice, two roles) — the ONLY exchange is the final group-by",
    "q_tpch_q19_disjunctive_revenue": "OR of mixed-table conjuncts: per-side bands still reach PushedFilters",
    "q_tfidf_top_terms": "ONE scan+explode feeds tf; doclen/df are windows OVER tf (join-back re-planned the subtree 3×); single-row corpus count broadcast",
    "q_dedup_canonical": "components map joined WITHOUT a broadcast hint — AQE picks the strategy (broadcast while small, shuffle join on a dup-heavy corpus)",
    "q_repetition_signals": "Gopher repetition filters fully in-row (higher-order arrays): NO exchange anywhere — map-only at any scale",
    "q_curation_funnel": "four curation gates in one scan; only shuffles are the md5-fingerprint window and the tiny final group-by",
    "q_semantic_dedup": "SemDeDup: broadcast centroid assign + broadcast representatives — one cosine per vector, nothing quadratic",
    "q_funnel_view_click_purchase": "three layered per-user windows REUSE one user_id exchange (no per-step self-joins)",
    "q_zscore_docs": "per-lang stats via two-pass agg (map-side collapse to |langs| rows) joined back — docs never shuffled by the skew-prone lang key; all codegen, no Python",
    "q_tpch_q12_late_shipments": "the schema's one fact⋈fact join: no hint, shuffle on orderkey (bucketed layout removes even that — tests/test_bucketing.py)",
    "q_tpch_q21_sole_late_supplier": "EXISTS/NOT-EXISTS pair as ONE pass: per-order distinct-supplier counts are collect_set windows over the flagged lines, inheriting the fact join's partitioning AND ordering (zero extra exchanges/sorts under SMJ) — the join-back form computed the fact join twice and exhausted sf100's local disk",
    "q_contamination_check": "5-gram hashes (longs) on the wire, benchmark set broadcast as hit-marker, ONE groupBy pass",
    "q_pack_sequences": "running-sum window partitioned by (lang, shard) — packing parallelism without a global sort",
    "q_simhash": "row-local SimHash: higher-order folds over the token-hash array — ZERO exchanges (the explode+groupBy form shuffled every token row)",
    "q_tpch_q2_min_cost_supplier": "correlated-MIN as analytic window: ONE partsupp scan; supplier snowflake + filtered part dim broadcast",
    "q_source_blocklist": "blocklist as broadcast LEFT ANTI riding the scan; per-lang rollup collapses map-side",
    "q_pii_redact": "PII scrub is pure codegen regexp — map-only, ZERO exchanges",
    "q_shuffle_shards": "deterministic global shuffle: ONE hash exchange on shard + in-partition sort (no global range sort)",
    "q_ivfpq_search": "IVF-PQ: candidates join as (cell, 8 codes) — ADC lookup sum in codegen, raw floats never shuffle",
    "q_ann_ivfpq_refined": "trained IVF-PQ + refine: corpus encode is ONE map-only Arrow MapInPandas (numpy ADC codes — measured faster than expression folds, SCALE.md), ADC shortlist window, then a tiny broadcast join back to raw vectors for exact re-rank",
    "q_gapfill_rollup": "gap-fill: spine GENERATED from |types|-row bounds, joined to the rollup (never to raw events)",
    "q_duplicate_spans": "substring dedup: 16-byte (doc_id, hash) rows on the wire, ONE uniform groupBy, HAVING prunes to the dup tail",
    "q_pagerank_parts_suppliers": "iterative PR: persisted edge list, per-iteration join+groupBy — integer fixed-point, so exact under any partition order",
    "q_pagerank_converged": "convergence-mode PR: max|Δrank|<=eps stop via observe-on-checkpoint (one job/round); <=1M-edge graphs run the bit-identical driver numpy loop, so the bench plan is a LocalTableScan",
    "q_stratified_sample": "mixture sample: literal CASE rates + md5 draw — pure map-only scan, zero joins",
    "q_c4_quality": "C4 quality rules: one scan, zero exchanges — every line metric a row-local array fold in codegen",
    "q_quality_classifier": "hashed linear classifier: token -> md5 bucket -> integer weight fold, one scan, zero exchanges (learned-table variant broadcasts the model)",
}

# Queries whose ADAPTIVE final plan is evidence: executed (noop write)
# and re-explained so AQE's runtime decisions are on record.
ADAPTIVE = {
    "q_dedup_canonical": "AQE final plan: with the components map small at this SF, the hint-free join SHOULD come back as a runtime broadcast",
}

KEEP = (
    "Scan", "PushedFilters", "ReadSchema", "HashAggregate", "Exchange",
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "TakeOrderedAndProject", "Window", "Sort ", "Filter", "Generate",
    "InMemoryTableScan", "LocalTableScan", "BroadcastNestedLoop",
    "CartesianProduct", "Project",
    # Python-boundary nodes: the dump must SHOW every Arrow crossing,
    # not hide it — a reviewer checking "UDFs off the hot path" reads
    # these lines
    "MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
    "BatchEvalPython",
)


def main() -> None:
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    out = [
        "# PLANS — captured physical plans (evidence for SCALE.md)",
        "",
        f"Generated by `python tools/dump_plans.py` at sf0.1.",
        "Lines filtered to operator/scan rows; `(n)` numbering is Spark's.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        lines = [
            ln.rstrip()[:200]
            for ln in plan.splitlines()
            if any(k in ln for k in KEEP)
        ]
        out += [f"## {name}", "", f"*{why}*", "", "```"] + lines + ["```", ""]
    for name, why in ADAPTIVE.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        # collect() runs the DataFrame's OWN QueryExecution (a .write
        # would spawn a fresh one), so AQE finalizes the plan we explain
        df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        lines = [
            ln.rstrip()[:200]
            for ln in plan.splitlines()
            if any(k in ln for k in KEEP) or "AdaptiveSparkPlan" in ln
        ]
        out += [f"## {name} (adaptive FINAL plan, after execution)", "", f"*{why}*", "", "```"] + lines + ["```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
