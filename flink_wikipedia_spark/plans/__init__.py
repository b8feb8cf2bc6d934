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

# SURVEY.md §2.1/§2.3 name these inventory queries differently than the
# primary registrations; alias so the correctness record carries both.
alias("q_filter_human_main", "q_filter_events")
alias("q_antijoin_inactive_users", "q_antijoin_quiet_customers")

__all__ = ["REGISTRY", "QueryDef", "alias", "query"]
