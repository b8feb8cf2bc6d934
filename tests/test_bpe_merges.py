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


def _bpe_fixture(tmp_path, texts):
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
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return con


def test_bpe_ids_matches_duckdb_oracle_on_fixture(spark, tmp_path):
    """q_bpe_ids: per-document token-id sequences pinned against the
    unrolled oracle on a corpus with nulls and empties — the md5 CSV
    fingerprint proves the EXACT id sequence, and a null doc must
    fingerprint as md5('')."""
    from flink_wikipedia_spark.plans import REGISTRY

    texts = [
        None,
        "",
        "the quick brown fox jumps over the lazy dog the fox",
        "lower lowest newer newest wider widest low new wide",
        "streaming streams streamed stream upstream downstream",
    ]
    con = _bpe_fixture(tmp_path, texts)
    qd = REGISTRY["q_bpe_ids"]
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct_ids, r.ids_fp)
        for r in qd.fn(spark, str(tmp_path)).collect()
    }
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(qd.oracle).fetchall()}
    assert got == want
    # null and empty docs: zero tokens, md5 of the empty CSV
    assert got[0] == got[1] == (0, 0, "d41d8cd98f00b204e9800998ecf8427e")


def test_bpe_ids_exact_sequences_via_python_replay(spark, tmp_path):
    """Independent Python replay of the WHOLE loop — learn merges,
    build the final vocabulary, rank it to ids (count desc, symbol
    asc, offset past the special slots), encode each doc — must
    reproduce the engine's per-doc id CSV md5 exactly. This pins the
    id ASSIGNMENT and the sequence order without DuckDB in the loop."""
    import hashlib

    from flink_wikipedia_spark.operators.text import _bpe_local
    from flink_wikipedia_spark.plans import REGISTRY
    from flink_wikipedia_spark.plans.queries_text import VOCAB_NUM_SPECIAL

    texts = [
        "banana bandana cabana banana",
        "ban ban cab cab ana ana",
        "the quick brown fox jumps over the lazy dog the fox",
    ]
    con = _bpe_fixture(tmp_path, texts)

    freq: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    merges = _bpe_local(sorted(freq.items()), 8)

    def seg_word(w: str) -> list[str]:
        syms = list(w)
        for _, a, b, _, _ in merges:  # rank order = applied order
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    vocab: dict[str, int] = {}
    for w, n in freq.items():
        for s in seg_word(w):
            vocab[s] = vocab.get(s, 0) + n
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    id_map = {s: VOCAB_NUM_SPECIAL + i for i, (s, _) in enumerate(ranked)}

    def doc_ids(t: str) -> list[int]:
        return [
            id_map[s]
            for w in t.lower().split(" ")
            if w
            for s in seg_word(w)
        ]

    want = {}
    for i, t in enumerate(texts):
        ids = doc_ids(t)
        csv = ",".join(str(x) for x in ids)
        want[i] = (
            len(ids),
            len(set(ids)),
            hashlib.md5(csv.encode()).hexdigest(),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct_ids, r.ids_fp)
        for r in REGISTRY["q_bpe_ids"].fn(spark, str(tmp_path)).collect()
    }
    assert got == want
    # and the oracle agrees with both
    ora = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(REGISTRY["q_bpe_ids"].oracle).fetchall()
    }
    assert ora == want


def test_bpe_ids_token_mass_equals_vocab_mass(spark, tmp_path):
    """Cross-query invariant: total encoded tokens (Σ n_tokens over
    docs) equals total vocabulary occurrence mass (Σ n_occurrences in
    q_bpe_vocab) — ids, vocab, and encode all count the same corpus."""
    from flink_wikipedia_spark.plans import REGISTRY

    texts = [
        "banana bandana cabana banana",
        "ban ban cab cab ana ana",
        "the quick brown fox jumps over the lazy dog the fox",
    ]
    _bpe_fixture(tmp_path, texts)
    ids_rows = REGISTRY["q_bpe_ids"].fn(spark, str(tmp_path)).collect()
    vocab_rows = REGISTRY["q_bpe_vocab"].fn(spark, str(tmp_path)).collect()
    assert sum(r.n_tokens for r in ids_rows) == sum(
        r.n_occurrences for r in vocab_rows
    )
    # ids are dense: every vocab symbol is used somewhere, so the
    # corpus-wide distinct-id count equals the vocabulary size
    assert max(r.n_distinct_ids for r in ids_rows) <= len(vocab_rows)


def test_vocab_fold_matches_distributed_derivation(spark):
    """bpe_vocab_from_segs (the r15 zero-job vocabulary fold over the
    trainer's final segmentations) must be value-identical to the
    distributed wrap→replace-chain→explode→groupBy derivation the
    q_bpe_vocab fallback runs — the same local/distributed bit-equality
    pin as the merge loop itself. Also pins the (count desc, symbol
    asc) ranking q_bpe_ids' id assignment depends on."""
    from flink_wikipedia_spark.operators.text import (
        BPE_WRAP_L,
        BPE_WRAP_R,
        bpe_train,
        bpe_vocab_from_segs,
        bpe_wrap_word_expr,
    )
    from flink_wikipedia_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges, segs = bpe_train(words, 8)
    assert segs is not None  # sf0.001 vocab is far under the guard
    local = bpe_vocab_from_segs(segs)

    seg = bpe_wrap_word_expr("word")
    for _, a, b, _, _ in sorted(merges, key=lambda m: m[0]):
        seg = F.replace(
            seg,
            F.lit(BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R),
            F.lit(BPE_WRAP_L + a + b + BPE_WRAP_R),
        )
    syms = F.split(
        F.btrim(seg, F.lit(BPE_WRAP_L + BPE_WRAP_R)), BPE_WRAP_R + BPE_WRAP_L
    )
    dist = {
        r.symbol: r.n
        for r in (
            words.select("freq", F.explode(syms).alias("symbol"))
            .groupBy("symbol")
            .agg(F.sum("freq").cast("long").alias("n"))
            .collect()
        )
    }
    assert dict(local) == dist
    # ranking is exactly (count desc, symbol asc)
    assert local == sorted(local, key=lambda kv: (-kv[1], kv[0]))
