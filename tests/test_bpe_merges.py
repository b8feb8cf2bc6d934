"""q_bpe_merges semantics: BPE merge learning (Sennrich et al. 2016).

Pins:
- exact merges on a hand-computable corpus (including the overlapping
  pair and the merged-symbol-reuse cases that distinguish greedy
  left-to-right BPE from replace-all);
- local (driver) vs distributed loop bit-equality on the real corpus;
- lexicographic tie-break determinism;
- the loud exhausted-pairs failure (a silent short merge list would
  ship a broken tokenizer);
- Spark-vs-DuckDB value equality via the unrolled oracle.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import pyspark.sql.functions as F


def _words_df(spark, pairs):
    return spark.createDataFrame(pairs, "word string, freq long")


def _learn(spark, pairs, k, **kw):
    from flink_wikipedia_spark.operators.text import bpe_learn_merges

    return [
        (r.merge_rank, r.lsym, r.rsym, r.merged, r.pair_count)
        for r in bpe_learn_merges(_words_df(spark, pairs), k, **kw).collect()
    ]


def test_hand_computed_merges(spark):
    """'abab'×3 + 'ab'×2: round 1 merges (a,b) n=3·2+2=8; round 2 then
    sees ('ab','ab') from the abab words, n=3."""
    got = _learn(spark, [("abab", 3), ("ab", 2)], 2)
    assert got == [(1, "a", "b", "ab", 8), (2, "ab", "ab", "abab", 3)]


def test_greedy_left_to_right_overlap(spark):
    """'aaaa': pairs (a,a) appear 3 times per word but greedy merging
    yields (aa)(aa) — the count is the PRE-merge adjacency count (3),
    while the next round sees ('aa','aa') exactly once."""
    got = _learn(spark, [("aaaa", 1)], 2)
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]


def test_merged_symbol_not_left_recombined_same_round(spark):
    """'abb': merging (a,b) must produce (ab)(b), and the fresh 'ab'
    does NOT recombine with the trailing b in the same round — round 2
    sees ('ab','b')."""
    got = _learn(spark, [("abb", 5)], 2)
    assert got == [(1, "a", "b", "ab", 5), (2, "ab", "b", "abb", 5)]


def test_lexicographic_tie_break(spark):
    """Equal counts: ('a','b') wins over ('b','a') and ('a','c')."""
    got = _learn(spark, [("ab", 2), ("ba", 2), ("ac", 2)], 1)
    assert got == [(1, "a", "b", "ab", 2)]


def test_exhausted_pairs_raises_loudly(spark):
    """All words single-symbol after 1 merge -> asking for 2 errors."""
    with pytest.raises(ValueError, match="exhausted pairs after 1"):
        _learn(spark, [("ab", 1)], 2)
    with pytest.raises(ValueError, match="exhausted pairs after 1"):
        _learn(spark, [("ab", 1)], 2, small_vocab_words=0)


def test_local_and_distributed_paths_bit_identical(spark):
    """The guarded driver fast path and the distributed per-round job
    loop must agree exactly — same pin as pagerank's small-graph
    guard. Run on the real sf0.001 corpus so ties and multi-char
    merges are exercised."""
    from flink_wikipedia_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from flink_wikipedia_spark.operators.text import bpe_learn_merges

    local = bpe_learn_merges(words, 8).collect()
    dist = bpe_learn_merges(words, 8, small_vocab_words=0).collect()
    assert local == dist
    # multi-char merges are learned (the loop is genuinely iterative,
    # not 8 independent character-pair counts)
    assert any(len(r.lsym) > 1 or len(r.rsym) > 1 for r in local)


def test_matches_duckdb_oracle_on_fixture(spark, tmp_path):
    """Unrolled-oracle equality on a corpus with nulls, empties, and
    repeated words — cheaper than the sf0.001 driver gate and covers
    the null-text edge the generator never emits."""
    from flink_wikipedia_spark.plans import REGISTRY

    texts = [
        None,
        "",
        "the quick brown fox jumps over the lazy dog the fox",
        "lower lowest newer newest wider widest low new wide",
        "streaming streams streamed stream upstream downstream",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["unit"] * len(texts),
            "n_chars": [len(t or "") for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    qd = REGISTRY["q_bpe_merges"]
    got = sorted(
        (r.merge_rank, r.lsym, r.rsym, r.merged, r.pair_count)
        for r in qd.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(qd.oracle).fetchall())
    assert got == want
