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
# ROUND-13 WINDOW — computed by ``tools/rotate_window.py --changed
# q_quality_classifier q_kmeans_doclen`` (this list is the tool's
# verbatim output).
# Composition (re-rotated mid-round when q_quality_triad_funnel
# registered — the rotation is rerun whenever the registry grows, so
# new code always gets driver evidence in its own round): rule 2 puts
# the TWO names with no driver record first (q_lm_perplexity — the
# hashed-bigram LM gate completing the quality triad — and
# q_quality_triad_funnel — the triad's attribution funnel); rule 3
# adds the changed names (q_quality_classifier: both its Spark fold
# and its oracle gained coalesce(text,'') for null-text parity, ADVICE
# r12; q_kmeans_doclen: upgraded from rows-only to a FULL value oracle
# — exact rational centroids + a recursive-CTE DuckDB twin, gated
# hash-green at sf0.001/0.01/1/100 before this rotation); rule 4 holds
# the 6 family anchors + flagship; rule 5 fills the remaining slots
# with the stalest r10-vintage names (q_window_navigation,
# alphabetically last, waits for r14). Expected r13 outcome: **50/50
# hash-green, ZERO rows-only in-window** — the first all-oracle window
# (the kmeans upgrade retired the window's only rows-only slot; the
# registry's remaining rows-only names are the three approx-sketch
# queries, each with an oracled exact twin). After r13 the stalest
# evidence is q_window_navigation (r10) then the 42 r11 names — the
# natural r14 rule-5 pool.
#
# NOTE for the r14 rotation (pre-declared, as r12 did for r13): once
# CORRECTNESS_r13.json lands it becomes the rotation input — run
# ``python tools/rotate_window.py --changed <r14-changed-names>``,
# paste its output here verbatim, and update ROUND_CHANGED + the
# families pin in tests/test_plan_audit.py in the same commit
# (test_priority_window_is_rotation_tool_output fails on a stale
# window by design, forcing the rotation at round start).
_PRIORITY = [
    "q_windowed_edit_size",  # r12
    "q_lm_perplexity",  # NEW (no driver row)
    "q_quality_triad_funnel",  # NEW (no driver row)
    "q_kmeans_doclen",  # r10
    "q_quality_classifier",  # r12
    "q_filter_events",  # r12
    "q_json_extract",  # r12
    "q_word_count",  # r12
    "q_pii_redact",  # r12
    "q_dedup_docs_exact",  # r12
    "q_multimodal_decode",  # r12
    "q_asof_join",  # r10
    "q_cohort_retention",  # r10
    "q_contamination_check",  # r10
    "q_corr_quantity_price",  # r10
    "q_curation_funnel",  # r10
    "q_data_quality_audit",  # r10
    "q_date_functions",  # r10
    "q_dedup_canonical",  # r10
    "q_dedup_components",  # r10
    "q_distribution_ranks",  # r10
    "q_doc_chunks",  # r10
    "q_duplicate_spans",  # r10
    "q_edit_event_decode",  # r10
    "q_filter_human_main",  # r10
    "q_funnel_view_click_purchase",  # r10
    "q_gapfill_rollup",  # r10
    "q_join_orders_customer",  # r10
    "q_lang_id",  # r10
    "q_multimodal_features",  # r10
    "q_multimodal_meta",  # r10
    "q_pack_sequences",  # r10
    "q_pivot_event_daily",  # r10
    "q_project",  # r10
    "q_quality_score",  # r10
    "q_simhash",  # r10
    "q_similarity_lsh",  # r10
    "q_sliding_window_counts",  # r10
    "q_snapshot_merge",  # r10
    "q_tfidf_top_terms",  # r10
    "q_token_budget_waterfill",  # r10
    "q_token_count",  # r10
    "q_tpch_q16_supplier_variety",  # r10
    "q_tpch_q17_small_quantity_revenue",  # r10
    "q_tpch_q18_large_orders",  # r10
    "q_tpch_q19_disjunctive_revenue",  # r10
    "q_tpch_q1_pricing_summary",  # r10
    "q_tpch_q21_sole_late_supplier",  # r10
    "q_tpch_q7_volume_shipping",  # r10
    "q_tpch_q9_nation_year_profit",  # r10
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
