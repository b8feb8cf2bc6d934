"""q_c4_quality semantics on line-structured documents.

The synthetic testdata corpus is single-line and punctuation-free, so
the driver's oracle gate only exercises the degenerate path of the C4
rules (1 line, 0 sentences, all screens false). These tests build a
small documents.parquet WITH line structure and pin (a) the exact rule
semantics per document and (b) Spark-vs-DuckDB value equality on the
non-degenerate paths (terminal punctuation, min-words-per-line,
javascript screen, lorem-ipsum/brace screens, line-level dup signal).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

DOCS = [
    # doc 0: clean page — 4 distinct ≥5-word lines ending in '.', keep=1
    (0, "the quick brown fox jumps over.\n"
        "a lazy dog sleeps in the sun.\n"
        "every good page has real sentences!\n"
        "does this line also count here?"),
    # doc 1: lorem-ipsum screen fires (page otherwise fine)
    (1, "this page looks quite normal at first.\n"
        "but Lorem Ipsum dolor sit amet consectetur.\n"
        "so the whole page must be dropped."),
    # doc 2: curly-brace screen fires
    (2, "function bodies do not belong here { return 1; }\n"
        "prose sentence number two is fine.\n"
        "prose sentence number three is fine.\n"
        "prose sentence number four is fine."),
    # doc 3: javascript line is not retained; short lines not retained;
    #        only 2 sentences -> keep=0
    (3, "please enable javascript to view this.\n"
        "too short.\n"
        "no terminal punctuation on this long enough line"),
    # doc 4: duplicated lines -> dup_line_frac > 0
    (4, "this exact line repeats itself verbatim ok.\n"
        "this exact line repeats itself verbatim ok.\n"
        "a different third line closes the page."),
    # doc 5: the synthetic-corpus shape — one line, no punctuation
    (5, "alpha beta gamma delta epsilon zeta"),
    # doc 6: empty text
    (6, ""),
]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("c4docs")
    pdf = pd.DataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in DOCS],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    from flink_wikipedia_spark.plans import REGISTRY

    df = REGISTRY["q_c4_quality"].fn(spark, sf_dir).toPandas()
    return df.set_index("doc_id").sort_index()


def test_c4_rule_semantics(result):
    r = result
    # doc 0: all four lines retained, keep
    assert r.loc[0, "n_lines"] == 4
    assert r.loc[0, "n_kept_lines"] == 4
    assert r.loc[0, "n_sentences"] == 4
    assert r.loc[0, "keep"] == 1
    # doc 1: lorem-ipsum screen (case-insensitive) kills the page
    assert r.loc[1, "has_lorem_ipsum"] == 1
    assert r.loc[1, "keep"] == 0
    # doc 2: brace screen kills the page even with 3 clean sentences
    assert r.loc[2, "has_brace"] == 1
    assert r.loc[2, "n_kept_lines"] >= 3
    assert r.loc[2, "keep"] == 0
    # doc 3: javascript line dropped, short line dropped, unpunctuated
    # line dropped; only 2 sentences on the page
    assert r.loc[3, "n_kept_lines"] == 0
    assert r.loc[3, "n_sentences"] == 2
    assert r.loc[3, "keep"] == 0
    # doc 4: 3 lines, 2 distinct -> dup fraction 1/3
    assert r.loc[4, "dup_line_frac"] == pytest.approx(1 / 3)
    assert r.loc[4, "keep"] == 1
    # doc 5: single unpunctuated line — the synthetic-corpus shape
    assert r.loc[5, "n_lines"] == 1
    assert r.loc[5, "n_words"] == 6
    assert r.loc[5, "max_line_words"] == 6
    assert r.loc[5, "n_kept_lines"] == 0
    assert r.loc[5, "keep"] == 0
    # doc 6: empty text still yields one (empty) line, zero words
    assert r.loc[6, "n_lines"] == 1
    assert r.loc[6, "n_words"] == 0
    assert r.loc[6, "dup_line_frac"] == 0.0


def test_c4_matches_duckdb_on_structured_docs(result, sf_dir):
    """Engine equality on the NON-degenerate paths the driver's
    synthetic corpus can't reach."""
    from flink_wikipedia_spark.plans import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    oracle = (
        con.execute(REGISTRY["q_c4_quality"].oracle)
        .fetchdf()
        .set_index("doc_id")
        .sort_index()
    )
    spark_df = result[oracle.columns]  # same column order
    pd.testing.assert_frame_equal(
        spark_df.astype("float64"), oracle.astype("float64")
    )


def test_classifier_table_variant_matches_fold(spark, sf_dir):
    """operators/text.classifier_score_with_table (broadcast learned-
    weight table — the real-deployment shape) must produce exactly the
    derived-weight fold's values when the table holds
    clf_weight_expr(b) for every bucket the corpus touches (missing
    buckets score 0, which the fold's total coverage makes moot)."""
    import pyspark.sql.functions as F

    from flink_wikipedia_spark.operators.text import (
        classifier_score_cols,
        classifier_score_with_table,
        clf_bucket_expr,
        clf_weight_expr,
    )
    from flink_wikipedia_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    fold = docs.select("doc_id", *classifier_score_cols("text"))
    weights = (
        docs.select(
            F.explode(
                F.filter(F.split(F.lower("text"), " "),
                         lambda w: w != F.lit(""))
            ).alias("tok")
        )
        .select(clf_bucket_expr(F.col("tok")).alias("bucket"))
        .distinct()
        .select("bucket", clf_weight_expr(F.col("bucket")).alias("weight"))
    )
    table = classifier_score_with_table(docs, weights)
    a = {r.doc_id: (r.n_tokens, r.score_sum, r.score_mean, r.keep)
         for r in fold.collect()}
    b = {r.doc_id: (r.n_tokens, r.score_sum, r.score_mean, r.keep)
         for r in table.collect()}
    assert a == b
    # the zero-token doc survives both paths with a null mean
    assert a[6] == (0, 0, None, 0)


def test_classifier_null_text_matches_oracle(spark, tmp_path):
    """ADVICE r12: null text must score identically on both engines.
    Both sides now coalesce(text,'') so a null doc behaves exactly like
    an empty doc: n_tokens=0, score_sum=0, null mean, keep=0."""
    from flink_wikipedia_spark.plans import REGISTRY

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [None, "", "alpha beta gamma"],
            "lang": ["en"] * 3,
            "source": ["unit"] * 3,
            "n_chars": [0, 0, 16],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    qd = REGISTRY["q_quality_classifier"]
    sdf = (
        qd.fn(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(qd.oracle).fetchdf().set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(
        sdf[oracle.columns].astype("float64"), oracle.astype("float64")
    )
    assert sdf.loc[0, "n_tokens"] == 0 and sdf.loc[0, "keep"] == 0


def test_triad_funnel_counts_additive_and_consistent(spark):
    """q_quality_triad_funnel invariants on the real corpus: stage
    labels are exactly the four declared, per-language counts are
    ADDITIVE (kept + losses = corpus), and the kept count equals the
    docs that pass all three standalone gates (the funnel can never
    disagree with the operators it is built from)."""
    import pyspark.sql.functions as F

    from flink_wikipedia_spark.operators.text import (
        classifier_score_cols,
        quality_score_cols,
        with_lm_keep,
    )
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    funnel = REGISTRY["q_quality_triad_funnel"].fn(spark, sf).collect()
    assert {r.stage for r in funnel} <= {
        "quality", "classifier", "lm_perplexity", "kept"
    }
    docs = load_table(spark, sf, "documents")
    assert sum(r.n_docs for r in funnel) == docs.count()
    kept_by_lang = {
        r.lang: r.n_docs for r in funnel if r.stage == "kept"
    }
    standalone = (
        with_lm_keep(
            docs.select(
                "lang",
                quality_score_cols("text")[3].alias("h_keep"),
                classifier_score_cols("text")[3].alias("c_keep"),
                "text",
            )
        )
        .filter("h_keep = 1 AND c_keep = 1 AND lm_keep = 1")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r.lang: r.n for r in standalone} == kept_by_lang


def test_triad_funnel_null_text_stage_parity(spark, tmp_path):
    """ADVICE r13: a null-text document must be attributed to the
    FIRST gate ('quality') on BOTH engines. Before the fix the oracle
    split raw text without coalesce, so h_ok was NULL, the 'quality'
    CASE arm was skipped, and the doc silently landed in 'classifier'
    while Spark (quality_score_cols keep=0) put it in 'quality' — a
    stage-attribution divergence no generator corpus could surface
    because the generator never emits null text."""
    from flink_wikipedia_spark.plans import REGISTRY

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                None,
                "",
                # long enough to pass the heuristic gate: 20+ tokens of
                # plausible prose with stopword-weighted words
                "the quick brown fox jumps over the lazy dog and then "
                "the dog wakes up to chase the fox around the big yard",
            ],
            "lang": ["en"] * 3,
            "source": ["unit"] * 3,
            "n_chars": [0, 0, 100],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    qd = REGISTRY["q_quality_triad_funnel"]
    got = {
        (r.lang, r.stage): r.n_docs
        for r in qd.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        (lang, stage): n
        for lang, stage, n in con.execute(qd.oracle).fetchall()
    }
    assert got == want
    # both null and empty text fail the heuristic stage specifically
    assert got.get(("en", "quality"), 0) >= 2
