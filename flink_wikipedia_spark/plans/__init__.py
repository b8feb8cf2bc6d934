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
# ROUND-10 WINDOW under that policy: no query-builder code changed, so
# the window is the 9 queries whose newest record is r6 (the stalest
# vintage), the 2 SURVEY-name aliases that have never had a driver row
# of their own (registered BEFORE the reorder so they can hold window
# slots), the 6 family anchors, all 28 r7-vintage queries, and 4
# r8-vintage picks (TPC-H Q1 — the sf100 scaling watch item — the
# dim-join anchor, the as-of join, and the UDF-surface anchor).
# Expected r10 outcome: 49 hash-green + 1 rows-only — q_kmeans_doclen
# is the window's only no-oracle-by-design query (data-dependent
# k-means has no deterministic DuckDB twin; property-pinned, with the
# oracled built-in twin q_zscore_docs also in-window).
_PRIORITY = [
    "q_windowed_edit_size",  # FLAGSHIP (O7+O8+O9) — must be slot 1
    # stalest vintage: newest driver record r6
    "q_cohort_retention",
    "q_curation_funnel",
    "q_data_quality_audit",
    "q_date_functions",
    "q_distribution_ranks",
    "q_funnel_view_click_purchase",
    "q_snapshot_merge",
    "q_token_budget_waterfill",
    "q_tpch_q21_sole_late_supplier",
    # SURVEY-name aliases — first driver row ever for these names
    "q_filter_human_main",       # alias of q_filter_events (O5)
    "q_antijoin_inactive_users", # alias of q_antijoin_quiet_customers (E6)
    # family anchors (hot, proven every round they were in-window)
    "q_filter_events",       # core
    "q_json_extract",        # core
    "q_word_count",          # text
    "q_pii_redact",          # curation
    "q_dedup_docs_exact",    # dedup
    "q_multimodal_decode",   # multimodal
    # r7 vintage (all 28)
    "q_contamination_check",
    "q_corr_quantity_price",
    "q_dedup_canonical",
    "q_dedup_components",
    "q_doc_chunks",
    "q_duplicate_spans",
    "q_edit_event_decode",
    "q_gapfill_rollup",
    "q_lang_id",
    "q_multimodal_features",
    "q_multimodal_meta",
    "q_pack_sequences",
    "q_pivot_event_daily",
    "q_project",
    "q_quality_score",
    "q_simhash",
    "q_similarity_lsh",
    "q_sliding_window_counts",
    "q_tfidf_top_terms",
    "q_token_count",
    "q_tpch_q16_supplier_variety",
    "q_tpch_q17_small_quantity_revenue",
    "q_tpch_q18_large_orders",
    "q_tpch_q19_disjunctive_revenue",
    "q_tpch_q7_volume_shipping",
    "q_tpch_q9_nation_year_profit",
    "q_window_navigation",
    "q_zscore_docs",
    # r8 vintage picks (4)
    "q_tpch_q1_pricing_summary",  # sf100 scaling watch item (SCALE.md)
    "q_join_orders_customer",     # E5 dim-join anchor
    "q_asof_join",
    "q_kmeans_doclen",            # no-oracle: rows-only by design
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
