"""q_lm_perplexity semantics: the hashed-bigram LM quality gate
(CCNet/KenLM shape — the third member of the quality triad).

Pins:
- exact values against a pure-Python twin of the hash→log-prob fold
  (same md5-prefix bucket + Knuth-LCG mix the engine and the DuckDB
  oracle evaluate);
- the n<2 / empty / null-text edge family (no bigrams → keep=0, null
  mean/bucket);
- Spark-vs-DuckDB value equality on a corpus that covers all three
  perplexity buckets;
- plan shape: ONE scan, ZERO exchanges (the row-local-fold contract
  the docstring claims at 100 TB).
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from flink_wikipedia_spark.operators.text import (
    LM_HEAD_MEAN_MICRO,
    LM_KEEP_MEAN_MICRO,
    LM_LP_FLOOR_MICRO,
    LM_LP_MOD,
    LM_MIX,
    LM_N_BUCKETS,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "alpha beta"),          # exactly one bigram
    (2, "single"),              # one token -> no bigrams
    (3, ""),                    # empty
    (4, None),                  # null text
    (5, "  spaced   out   tokens  "),  # empty-string tokens dropped
    (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
]


def py_lm(text: str | None) -> tuple[int, int, float | None, str | None, int]:
    toks = [w for w in (text or "").lower().split(" ") if w != ""]
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    lps = []
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % LM_N_BUCKETS
        lps.append(-(LM_LP_FLOOR_MICRO + (b * LM_MIX) % LM_LP_MOD))
    n, s = len(grams), sum(lps)
    if n == 0:
        return 0, 0, None, None, 0
    mean = float(s) / (n * 1_000_000)
    bucket = (
        "head" if s >= LM_HEAD_MEAN_MICRO * n
        else "middle" if s >= LM_KEEP_MEAN_MICRO * n
        else "tail"
    )
    return n, s, mean, bucket, int(s >= LM_KEEP_MEAN_MICRO * n)


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lmdocs")
    pdf = pd.DataFrame(
        [(i, t, "en", "unit", len(t or "")) for i, t in DOCS],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    from flink_wikipedia_spark.plans import REGISTRY

    df = REGISTRY["q_lm_perplexity"].fn(spark, sf_dir)
    return df, {r.doc_id: r for r in df.collect()}


def test_values_match_python_twin(result):
    _, rows = result
    for doc_id, text in DOCS:
        n, s, mean, bucket, keep = py_lm(text)
        r = rows[doc_id]
        assert (r.n_bigrams, r.logprob_sum) == (n, s), doc_id
        assert r.ppl_bucket == bucket and r.keep == keep, doc_id
        if mean is None:
            assert r.logprob_mean is None
        else:
            assert r.logprob_mean == mean  # one IEEE division, bit-exact


def test_no_bigram_edge_family(result):
    _, rows = result
    for doc_id in (2, 3, 4):  # single token / empty / null text
        r = rows[doc_id]
        assert (r.n_bigrams, r.logprob_sum, r.keep) == (0, 0, 0)
        assert r.logprob_mean is None and r.ppl_bucket is None


def test_matches_duckdb_oracle(result, sf_dir):
    from flink_wikipedia_spark.plans import REGISTRY

    df, _ = result
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = (
        con.execute(REGISTRY["q_lm_perplexity"].oracle)
        .fetchdf()
        .set_index("doc_id")
        .sort_index()
    )
    sdf = df.toPandas().set_index("doc_id").sort_index()[oracle.columns]
    pd.testing.assert_frame_equal(sdf, oracle, check_dtype=False)


def test_all_three_buckets_reachable_on_real_corpus(spark):
    """The thresholds straddle the derived table's mean (-4.5): head,
    middle, and tail must all be populated on the synthetic corpus —
    a filter whose cut lies outside the score distribution gates
    nothing."""
    from flink_wikipedia_spark.plans import REGISTRY

    df = REGISTRY["q_lm_perplexity"].fn(spark, "/root/testdata/sf0.001")
    seen = {r.ppl_bucket for r in df.select("ppl_bucket").distinct().collect()}
    assert {"head", "middle", "tail"} <= seen


def test_plan_is_one_scan_zero_exchanges(result):
    """The perplexity FOLD itself is exchange-free: the only exchange
    permitted in the plan is the unsplittable-input scan spread's
    round-robin repartition (load_table_spread, r15 — fires only on
    few-row-group inputs like the test files; at production row-group
    counts the plan has no exchange at all). Any hash/range exchange
    would mean the fold regressed to a shuffling formulation."""
    df, _ = result
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    # With AQE query stages (the spread's exchange), toString() prints both
    # the Final Plan and the Initial Plan sections — count scans only in the
    # final-plan half or the same scan is double-counted.
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Scan parquet") == 1


def test_table_variant_matches_fold(spark, sf_dir):
    """operators/text.lm_score_with_table (broadcast learned-logprob
    table — the real-KenLM deployment shape) must produce exactly the
    derived fold's values when the table holds lm_bigram_logprob_expr(b)
    for every bucket the corpus touches (the backoff never fires under
    total coverage). Same pin as the classifier's table twin."""
    import pyspark.sql.functions as F

    from flink_wikipedia_spark.operators.text import (
        LM_N_BUCKETS,
        lm_bigrams_from_toks,
        lm_logprob_from_bucket,
        lm_perplexity_frame,
        lm_score_with_table,
        lm_tokens_expr,
    )
    from flink_wikipedia_spark.functions.compat import stable_token_hash
    from flink_wikipedia_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    fold = lm_perplexity_frame(docs)
    buckets = (
        docs.select(lm_tokens_expr("text").alias("_t"))
        .select(F.explode(lm_bigrams_from_toks(F.col("_t"))).alias("g"))
        .select((stable_token_hash(F.col("g")) % LM_N_BUCKETS).alias("bucket"))
        .distinct()
    )
    logprobs = buckets.select(
        "bucket", lm_logprob_from_bucket(F.col("bucket")).alias("logprob")
    )
    table = lm_score_with_table(docs, logprobs)
    key = lambda r: (  # noqa: E731
        r.n_bigrams, r.logprob_sum, r.logprob_mean, r.ppl_bucket, r.keep
    )
    a = {r.doc_id: key(r) for r in fold.collect()}
    b = {r.doc_id: key(r) for r in table.collect()}
    assert a == b
    # the no-bigram docs survive the explode_outer path with keep=0
    assert a[3] == (0, 0, None, None, 0)


def test_with_lm_keep_matches_frame(spark, sf_dir):
    """operators/text.with_lm_keep (the streaming-gate layout: keep
    decision appended next to the payload) must agree with
    lm_perplexity_frame's keep for every doc, and must preserve the
    input columns."""
    from flink_wikipedia_spark.operators.text import (
        lm_perplexity_frame,
        with_lm_keep,
    )
    from flink_wikipedia_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    gated = with_lm_keep(docs)
    assert set(docs.columns) | {"lm_keep"} == set(gated.columns)
    a = {r.doc_id: r.lm_keep for r in gated.collect()}
    b = {r.doc_id: r.keep for r in lm_perplexity_frame(docs).collect()}
    assert a == b


def test_sparse_table_backoff_penalizes_unseen(spark, tmp_path):
    """ADVICE r13: a SPARSE learned table (the real-KenLM deployment
    shape) must treat an unseen bigram as LOW probability, not
    probability 1 — before the fix, missing buckets coalesced to
    0 µlog10 (strictly higher than every representable table value),
    so unseen bigrams pulled docs toward 'head'/keep. Pins: (a) the
    backoff constant sits strictly below the whole derived family's
    range, (b) a doc whose bigrams are all absent from the table lands
    in 'tail' with keep=0, (c) the explicit backoff_micro=0 escape
    hatch restores the old 'unseen is perfect' scoring."""
    import pandas as pd
    import pyspark.sql.functions as F

    from flink_wikipedia_spark.operators.text import (
        LM_BACKOFF_MICRO,
        LM_LP_FLOOR_MICRO,
        LM_LP_MOD,
        lm_score_with_table,
    )

    assert LM_BACKOFF_MICRO == -(LM_LP_FLOOR_MICRO + LM_LP_MOD)
    # strictly below the derived range [-8_000_000, -1_000_000]
    assert LM_BACKOFF_MICRO < -(LM_LP_FLOOR_MICRO + LM_LP_MOD - 1)

    pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["alpha beta gamma delta epsilon zeta"],
            "lang": ["en"],
            "source": ["unit"],
            "n_chars": [35],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    empty_table = spark.createDataFrame([], "bucket long, logprob long")

    row = lm_score_with_table(docs, empty_table).collect()[0]
    assert row.n_bigrams == 5
    assert row.logprob_sum == 5 * LM_BACKOFF_MICRO
    assert row.ppl_bucket == "tail" and row.keep == 0

    legacy = lm_score_with_table(
        docs, empty_table, backoff_micro=0
    ).collect()[0]
    assert legacy.logprob_sum == 0 and legacy.ppl_bucket == "head"
