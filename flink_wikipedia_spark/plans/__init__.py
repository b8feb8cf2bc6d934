"""Query plans — the engine's public query surface.

``registry.py`` holds the name → (Spark builder, DuckDB oracle) mapping
that ``__spark_entry__.py`` exposes to the driver. Importing this
package populates the registry from every query module.
"""

from flink_wikipedia_spark.plans.registry import REGISTRY, QueryDef, alias, query

# Import for side effect: each module registers its queries.
from flink_wikipedia_spark.plans import queries_core  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_relational  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_tpch  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_functions  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_text  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_dedup  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_similarity  # noqa: E402,F401
from flink_wikipedia_spark.plans import queries_curation  # noqa: E402,F401

# The driver's correctness gate verifies the FIRST 50 registry entries
# only (CORRECTNESS_r01 stopped at slot 50), so registration order is
# part of the contract. STANDING WINDOW POLICY (coverage closed in
# round 8 — every registry query has at least one driver record):
#   1. flagship q_windowed_edit_size is always slot 1 (it is entry());
#   2. any query whose implementation changed this round goes in-window
#      (changed code with only stale evidence is untested code);
#   3. remaining slots refresh the STALEST evidence first — per-query
#      newest driver round comes from the CORRECTNESS_r*.json history;
#   4. one anchor per operator family stays in-window every round so a
#      family regression can never hide behind rotation;
#   5. no-oracle (rows-only) queries in the window are pre-declared
#      below so the verdict can check the gate outcome against a
#      written prediction.
#
# ROUND-14 WINDOW — computed by ``tools/rotate_window.py --changed
# q_quality_triad_funnel q_lm_perplexity`` (this list is the tool's
# verbatim output; re-run mid-round if the registry grows — e.g. when
# q_bpe_merges registers — so new code earns driver evidence in its
# own round).
# Composition (re-rotated mid-round as the registry grew — first when
# q_bpe_merges registered, again for q_bpe_encode and q_bpe_vocab):
# rule 2 puts the THREE names with no driver record first
# (q_bpe_encode — the encode half of the learn→apply tokenizer
# pipeline, per-doc segmentation fingerprint oracle; q_bpe_merges —
# BPE merge learning, the third iterative-algorithm conquest, full
# unrolled value oracle; q_bpe_vocab — the final post-merge symbol
# vocabulary with exact corpus counts); rule 3
# adds the two ADVICE-r13 touched names (q_quality_triad_funnel:
# oracle gains coalesce so null text fails the heuristic stage on BOTH
# sides — the latent stage-attribution divergence ADVICE flagged;
# q_lm_perplexity: the lm_score_with_table seam's missing-bucket
# backoff becomes a floor penalty instead of probability-1 — query
# values unchanged, but the changed-code rule is about evidence, not
# expected deltas); rule 4 now holds TWELVE family anchors + flagship
# — the r14 rotation exposed that the six hand-era anchors left the
# similarity/relational/TPC-H/functions/graph/streaming-twin families
# with no structural in-window representative, so rotate_window.py
# gained one canonical anchor per semantic family checked by
# tests/test_plan_audit.py (the invariant now holds by construction);
# rule 5 fills the remaining 35 slots with the stalest evidence:
# q_window_navigation and q_zscore_docs (the last r10-vintage names)
# then 30 r11-vintage names alphabetically (q_tpch_q2/q3/q5/q6,
# q_tpch_q10_returned_items, q_tpch_q15_top_supplier,
# q_tpch_q20_excess_stock_suppliers, q_tpch_q22_dormant_accounts,
# q_union_all_actions, q_unpivot_metrics and the other r11/r12 tail
# wait for r15). Expected r14 outcome:
# **50/50 hash-green, ZERO rows-only in-window** — the second
# consecutive all-oracle window (the registry's only rows-only names
# remain the three approx-sketch queries, all out-of-window with
# oracled exact twins).
#
# NOTE for the r15 rotation (pre-declared): once CORRECTNESS_r14.json
# lands it becomes the rotation input — run ``python
# tools/rotate_window.py --changed <r15-changed-names>``, paste its
# output here verbatim, and update ROUND_CHANGED + the families pin in
# tests/test_plan_audit.py in the same commit
# (test_priority_window_is_rotation_tool_output fails on a stale
# window by design, forcing the rotation at round start).
_PRIORITY = [
    "q_windowed_edit_size",  # r13
    "q_bpe_encode",  # NEW (no driver row)
    "q_bpe_merges",  # NEW (no driver row)
    "q_bpe_vocab",  # NEW (no driver row)
    "q_lm_perplexity",  # r13
    "q_quality_triad_funnel",  # r13
    "q_filter_events",  # r13
    "q_json_extract",  # r13
    "q_word_count",  # r13
    "q_pii_redact",  # r13
    "q_dedup_docs_exact",  # r13
    "q_multimodal_decode",  # r13
    "q_similarity_lsh",  # r13
    "q_join_orders_customer",  # r13
    "q_tpch_q1_pricing_summary",  # r13
    "q_rank_functions",  # r11
    "q_dedup_components",  # r13
    "q_keyby_agg_edit_size",  # r11
    "q_window_navigation",  # r10
    "q_zscore_docs",  # r10
    "q_antijoin_quiet_customers",  # r11
    "q_array_functions",  # r11
    "q_bigram_counts",  # r11
    "q_dedup_events",  # r11
    "q_dedup_pipeline",  # r11
    "q_edit_distance_kernel",  # r11
    "q_embedding_neardup_kernel",  # r11
    "q_encode_tokens",  # r11
    "q_grouping_sets_lineitem",  # r11
    "q_map_functions",  # r11
    "q_minhash_dedup_pairs",  # r11
    "q_multimodal_frames",  # r11
    "q_orders_by_month",  # r11
    "q_regex_extract_props",  # r11
    "q_repetition_signals",  # r11
    "q_repetition_stats",  # r11
    "q_running_total",  # r11
    "q_semijoin_active_customers",  # r11
    "q_ship_latency_histogram",  # r11
    "q_shuffle_shards",  # r11
    "q_similarity_topk",  # r11
    "q_source_blocklist",  # r11
    "q_span_mask_stats",  # r11
    "q_stratified_sample",  # r11
    "q_string_functions",  # r11
    "q_to_json_roundtrip",  # r11
    "q_top_tokens_per_lang",  # r11
    "q_topk_docs_per_lang",  # r11
    "q_tpch_q11_important_stock",  # r11
    "q_tpch_q12_late_shipments",  # r11
    # --- driver cutoff is 50; everything below is registry tail ---
]

# SURVEY.md §2 names the O5 and E6 inventory queries differently than
# their primary registrations; register the survey names as aliases so
# a line-by-line inventory check resolves either name. Registered
# BEFORE the reorder so _PRIORITY may place them inside the window.
alias("q_filter_human_main", "q_filter_events")
alias("q_antijoin_inactive_users", "q_antijoin_quiet_customers")


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # fail loudly at import — a typo here silently demotes a query
        raise RuntimeError(f"priority list names unknown queries: {missing}")
    if len(_PRIORITY) != 50:
        raise RuntimeError(f"driver window must be exactly 50, got {len(_PRIORITY)}")
    tail = [n for n in REGISTRY if n not in set(_PRIORITY)]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QueryDef", "alias", "query"]
