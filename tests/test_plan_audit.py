"""Physical-plan audit (scale discipline as a test): no query in the
registry may plan a CartesianProduct, and BroadcastNestedLoopJoin is
allowed only where a small broadcast side makes it the intended
physical op — the explicit allowlist below. A new query that
accidentally cross-joins two large inputs fails here before it ever
reaches a benchmark.
"""

from __future__ import annotations

import pytest

from flink_wikipedia_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# Queries whose plans legitimately contain BroadcastNestedLoopJoin:
# every entry broadcasts a provably-small side (single-row scalar or a
# bounded kernel set), where BNLJ IS the efficient strategy.
BNLJ_ALLOWED = {
    "q_tfidf_top_terms",      # single-row corpus-count broadcast
    "q_similarity_topk",      # bounded query-vector kernel (brute-force baseline)
    "q_ann_ivf",              # small centroid table for coarse quantization
    "q_embedding_neardup",    # bounded candidate kernel (LSH variant covers full corpus)
    "q_edit_distance_pairs",  # fixed tiny pair set
    "q_tpch_q22_dormant_accounts",  # single-row global-average broadcast
}


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_and_bnlj_only_allowlisted(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin but is not allowlisted — "
            "either broadcast a provably-small side intentionally (and add it "
            "here with a reason) or fix the join keys"
        )
