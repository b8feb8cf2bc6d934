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


def test_bpe_encode_applies_learned_merges(spark, tmp_path):
    """q_bpe_encode: the learned rules replayed over each document.
    On a corpus where 'ab' is learned, 'abab cd' must segment to
    [ab][ab] [c][d] — 2 words, 3 subwords — and the seg_fp pins the
    exact sequence against the oracle."""
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
    qd = REGISTRY["q_bpe_encode"]
    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.seg_fp)
        for r in qd.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(qd.oracle).fetchall()}
    assert got == want
    # null and empty docs encode to nothing
    assert got[0] == got[1]
    assert got[0][:2] == (0, 0)
    # merges genuinely compress: subwords strictly fewer than chars,
    # strictly more than words (8 merges can't fully fuse these words)
    n_words, n_sub, _ = got[2]
    n_chars_no_space = len(texts[2].replace(" ", ""))
    assert n_words == 11 and n_words < n_sub < n_chars_no_space


def test_bpe_encode_subword_counts_consistent_with_local_replay(spark, tmp_path):
    """Python replay of learn+apply must reproduce the engine's
    per-doc subword counts exactly (the same wrapped-string semantics
    end to end)."""
    from flink_wikipedia_spark.operators.text import (
        BPE_WRAP_L,
        BPE_WRAP_R,
        _bpe_local,
    )
    from flink_wikipedia_spark.plans import REGISTRY

    texts = {
        1: "banana bandana cabana banana",
        2: "ban ban cab cab ana ana",
    }
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 2,
            "source": ["unit"] * 2,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    freq: dict[str, int] = {}
    for t in texts.values():
        for w in t.split(" "):
            freq[w] = freq.get(w, 0) + 1
    # engine runs BPE_NUM_MERGES=8 rules; replay the same 8
    merges = _bpe_local(sorted(freq.items()), 8)

    def seg_doc(t: str) -> str:
        seg = " ".join(
            "".join(BPE_WRAP_L + c + BPE_WRAP_R for c in w)
            for w in t.split(" ") if w
        )
        for _, a, b, _, _ in merges:
            seg = seg.replace(
                BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R,
                BPE_WRAP_L + a + b + BPE_WRAP_R,
            )
        return seg

    want = {i: seg_doc(t).count(BPE_WRAP_L) for i, t in texts.items()}
    got = {
        r.doc_id: r.n_subwords
        for r in REGISTRY["q_bpe_encode"].fn(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_bpe_vocab_symbols_and_counts(spark, tmp_path):
    """q_bpe_vocab: the final vocabulary contains every learned merged
    symbol plus the surviving single characters, and counts are exact
    corpus occurrences (word freq × in-word count). Pinned against the
    oracle AND a structural invariant: total symbol mass equals total
    post-merge subword count."""
    from flink_wikipedia_spark.plans import REGISTRY

    texts = [
        "banana bandana cabana banana",
        "ban ban cab cab ana ana",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["unit"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r.symbol: r.n_occurrences
        for r in REGISTRY["q_bpe_vocab"].fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = dict(con.execute(REGISTRY["q_bpe_vocab"].oracle).fetchall())
    assert got == want
    # the 8 learned merges (see test_bpe_encode_..._local_replay) end
    # with fully-fused 'banana' and 'bandana'; 'cab' and 'ana' survive
    assert {"banana", "bandana", "cab", "ana"} <= set(got)
    # every count positive; symbol mass equals the corpus subword count
    assert all(n > 0 for n in got.values())
    enc = {
        r.doc_id: r.n_subwords
        for r in REGISTRY["q_bpe_encode"].fn(spark, str(tmp_path)).collect()
    }
    assert sum(got.values()) == sum(enc.values())
