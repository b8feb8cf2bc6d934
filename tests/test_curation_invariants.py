"""Invariant tests for the round-2 curation / similarity additions —
the DuckDB oracle proves value equality; these pin the semantic
contracts a hash comparison can't express (permutation-ness of the
shard shuffle, no-residual-PII, spine density, ADC recall sanity).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from flink_wikipedia_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_shuffle_shards_is_a_permutation(spark):
    out = REGISTRY["q_shuffle_shards"].fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # every document placed exactly once
    assert sorted(r.doc_id for r in out) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    # positions are contiguous 1..n within each shard (a dataloader can
    # seek shard files by offset)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_shards_stable_under_repartition(spark):
    base = REGISTRY["q_shuffle_shards"].fn(spark, SF)
    placed = {(r.doc_id, r.shard, r.pos) for r in base.collect()}
    again = {(r.doc_id, r.shard, r.pos) for r in base.repartition(13).collect()}
    assert placed == again


def test_pii_redact_leaves_no_matches(spark):
    from flink_wikipedia_spark.plans.queries_curation import EMAIL_RE, IPV4_RE

    rows = REGISTRY["q_pii_redact"].fn(spark, SF).collect()
    email, ipv4 = re.compile(EMAIL_RE), re.compile(IPV4_RE)
    assert all(r.n_emails >= 1 for r in rows)  # the synthesized header
    assert all(r.n_ips >= 1 for r in rows)
    for r in rows:
        assert not email.search(r.redacted_head), r.redacted_head
        assert not ipv4.search(r.redacted_head), r.redacted_head
        assert "<EMAIL>" in r.redacted_head


def test_source_blocklist_drops_only_blocked(spark):
    from flink_wikipedia_spark.plans.queries_curation import BLOCKED_SOURCES

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = sum(
        r.n_docs_kept
        for r in REGISTRY["q_source_blocklist"].fn(spark, SF).collect()
    )
    expected = docs.filter(~F.col("source").isin(BLOCKED_SOURCES)).count()
    assert kept == expected


def test_gapfill_spine_is_dense_and_locf_monotone(spark):
    rows = REGISTRY["q_gapfill_rollup"].fn(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for typ, rs in by_type.items():
        rs.sort(key=lambda r: r.bucket)
        # hourly buckets with no holes
        for a, b in zip(rs, rs[1:]):
            assert (b.bucket - a.bucket).total_seconds() == 3600, typ
        # LOCF: null only before the first observation, then always set
        seen = False
        for r in rs:
            if r.sum_value is not None:
                seen = True
            assert (r.locf_value is not None) == seen, typ
        # gap rows report zero events and no raw sum
        assert all(r.sum_value is None for r in rs if r.n_events == 0)


def _exact_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx_rows, exact_sets) -> float:
    hits = sum(
        1 for r in approx_rows if r.neighbor_id in exact_sets.get(r.query_id, set())
    )
    assert approx_rows
    return hits / len(approx_rows)


def test_ivfpq_recall_against_exact_topk(spark):
    """The oracle-exact q_ivfpq_search uses UNTRAINED synthetic
    codebooks by construction (static SQL twin ⇒ data-independent
    literals), so its ADC carries weak ranking signal on the
    structureless fixture — this floor only pins "not pure noise".
    The production-quality recall gate lives on q_ann_ivfpq_refined
    (trained index) in test_ann_refined_recall_at_least_0_7 below."""
    exact_sets = _exact_sets(REGISTRY["q_similarity_topk"].fn(spark, SF).collect())
    approx = REGISTRY["q_ivfpq_search"].fn(spark, SF).collect()
    assert _recall(approx, exact_sets) >= 0.2, "IVF-PQ sank below noise floor"


def test_ann_ivf_recall_at_least_0_6(spark):
    """IVF-Flat (exact cosine within probed cells) recall vs the
    brute-force exact top-5. Measured 0.92 at both sf0.001 and sf0.01;
    the 0.6 floor catches a broken cell assignment or probe ranking
    while tolerating coverage variance of the 2/16-cell probe."""
    exact_sets = _exact_sets(REGISTRY["q_similarity_topk"].fn(spark, SF).collect())
    approx = REGISTRY["q_ann_ivf"].fn(spark, SF).collect()
    assert _recall(approx, exact_sets) >= 0.6


def test_ann_refined_recall_at_least_0_7(spark):
    """THE ANN quality gate (round-6 task): trained IVF-PQ + exact
    refine must reach recall@10 >= 0.7 vs brute force. Params chosen by
    a sweep over n_probe/codebook size/rerank depth (SCALE.md): 16
    trained cells, probe 10, PQ 8x16 trained, exact rerank of ADC
    top-150 — measured 0.86 (sf0.001) / 0.80 (sf0.01) on the
    random-unit-vector fixture, ANN's adversarial case. Also pins
    determinism: two independent builds return identical rows."""
    from flink_wikipedia_spark.operators.similarity import topk_cosine
    from flink_wikipedia_spark.schemas import load_table

    emb = load_table(spark, SF, "embeddings")
    exact = topk_cosine(emb.filter(F.col("vec_id") < 5), emb, 10).collect()
    approx = REGISTRY["q_ann_ivfpq_refined"].fn(spark, SF).collect()
    rec = _recall(approx, _exact_sets(exact))
    assert rec >= 0.7, f"trained IVF-PQ+refine recall@10 = {rec}"
    again = REGISTRY["q_ann_ivfpq_refined"].fn(spark, SF).collect()
    assert sorted(map(tuple, approx), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, again), key=lambda t: (t[0], t[3])
    )


def test_lsh_buckets_are_locality_sensitive(spark):
    """What single-band sign-LSH actually promises is AMPLIFICATION —
    same-bucket collision must be substantially likelier for similar
    pairs than for random pairs (global top-k recall is explicitly NOT
    promised at one band; band-OR across tables is the scale lever,
    exercised by the near-dup family). Buckets come from the production
    Spark expression; cosines from numpy on the same fixture. Measured
    ratio at sim>=0.3: 3.5 (sf0.001) / 5.9 (sf0.01); floor 2.0."""
    import numpy as np
    import pyarrow.parquet as pq

    from flink_wikipedia_spark.operators.similarity import lsh_bucket_expr
    from flink_wikipedia_spark.schemas import load_table

    emb = load_table(spark, SF, "embeddings")
    rows = emb.select(
        "vec_id", lsh_bucket_expr(F.col("embedding")).alias("bucket")
    ).collect()
    bucket = np.empty(len(rows), dtype=np.int64)
    for r in rows:
        bucket[r.vec_id] = r.bucket
    X = np.array(
        pq.read_table(f"{SF}/embeddings.parquet").column("embedding").to_pylist(),
        dtype=np.float64,
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    S = X @ X.T
    iu = np.triu_indices(len(X), 1)
    sims, coll = S[iu], bucket[iu[0]] == bucket[iu[1]]
    p_all = coll.mean()
    p_hi = coll[sims >= 0.3].mean()
    assert p_all > 0, "no collisions at all — bucketing degenerate"
    assert p_hi / p_all >= 2.0, f"LSH amplification {p_hi / p_all:.2f} < 2"


def test_vocab_ids_dense_and_encode_consistent(spark):
    vocab = REGISTRY["q_vocab_ids"].fn(spark, SF).collect()
    ids = sorted(r.token_id for r in vocab)
    # ids are dense starting right after the reserved specials
    assert ids == list(range(4, 4 + len(ids)))
    # frequency-ranked: a higher id never has a strictly higher count
    by_id = sorted(vocab, key=lambda r: r.token_id)
    assert all(a.n >= b.n for a, b in zip(by_id, by_id[1:]))

    enc = REGISTRY["q_encode_tokens"].fn(spark, SF).collect()
    docs = {r.doc_id: r for r in enc}
    raw = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert set(docs) == {r.doc_id for r in raw}
    # per-doc token counts match the source text exactly
    for r in raw:
        assert docs[r.doc_id].n_tokens == len(r.text.split(" "))
    # fingerprints are deterministic across independent executions
    again = {r.doc_id: r.ids_fp for r in REGISTRY["q_encode_tokens"].fn(spark, SF).collect()}
    assert all(again[d] == r.ids_fp for d, r in docs.items())


def test_waterfill_conserves_budget_and_caps_rates(spark):
    """Water-filling invariants: allocations sum exactly to the budget
    (when the corpus exceeds it), no source exceeds its own tokens or
    rate 1.0, saturated sources contribute everything, and every
    unsaturated source sits at one common cap >= every saturated size."""
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.plans.queries_curation import TOKEN_BUDGET
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q_token_budget_waterfill"].fn(spark, SF_SMOKE).collect()
    total_alloc = sum(r.alloc_tokens for r in rows)
    corpus_total = sum(r.n_tokens for r in rows)
    if corpus_total >= TOKEN_BUDGET:
        assert abs(total_alloc - TOKEN_BUDGET) < 1e-6
    sat = [r for r in rows if r.sample_rate == 1.0]
    unsat = [r for r in rows if r.sample_rate < 1.0]
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.alloc_tokens <= r.n_tokens + 1e-9
    caps = {round(r.alloc_tokens, 6) for r in unsat}
    assert len(caps) <= 1  # all unsaturated share ONE water level
    if unsat and sat:
        cap = caps.pop()
        assert all(r.n_tokens <= cap + 1e-9 for r in sat)


def test_funnel_stages_monotone(spark):
    """Ordered-funnel invariant: stage counts never increase (a user
    cannot complete step k+1 in order without completing step k)."""
    from flink_wikipedia_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = {
        r.stage: r.n_users
        for r in REGISTRY["q_funnel_view_click_purchase"].fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_curation_funnel_counts_additive(spark):
    """Funnel attribution is a partition: per-stage counts sum to the
    corpus size (every doc charged to exactly one stage)."""
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.schemas import load_table
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q_curation_funnel"].fn(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    stages = {r.stage for r in rows}
    assert "kept" in stages and stages <= {
        "blocked", "quality", "repetition", "duplicate", "kept"
    }
