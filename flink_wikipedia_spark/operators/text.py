"""Text-analysis operators for LLM-corpus pipelines (north star E3+):
tokenization/word-count, heuristic language ID, quality scoring, token
counting, and document fingerprinting.

All pure built-in expressions — whole-stage codegen end to end, no
Python in any hot path. At 100 TB, per-document string work is the
dominant cost of corpus prep; keeping it JVM-side is the difference
between CPU-bound and serialization-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import (
    arrow_local_df,
    stable_token_hash,
)
from flink_wikipedia_spark.functions.constants import (
    HM_MOD,
    LANG_STOPWORDS,
    QUALITY_STOPWORDS,
)

# BPE-ish word/number segmentation: runs of letters or digits (a cheap,
# deterministic stand-in for a learned tokenizer's pre-tokenization).
BPE_ISH_PATTERN = "[a-z]+|[0-9]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word count: explode tokens → hash-aggregate.

    explode is generate-style (no shuffle); the single shuffle is the
    groupBy(token), with map-side partial counting absorbing the heavy
    hitters (stopwords) before the wire — the skew answer for Zipfian
    token distributions."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .count()
        .withColumnRenamed("count", "n")
    )


def token_count_cols(text_col: str = "text") -> list[Column]:
    """Per-document token counts: whitespace tokens + BPE-ish regex
    tokens (regexp_count stays in codegen)."""
    # cast to long: DuckDB's len()/regexp counts are BIGINT, Spark's size()
    # is int — widths must agree for the oracle's schema/hash compare
    return [
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
    ]


def lang_score_expr(text_col: str, lang: str) -> Column:
    """Stopword hits for one language: |distinct(tokens) ∩ stopwords|."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    lits = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, lits))


def lang_id_expr(text_col: str = "text") -> Column:
    """Heuristic language ID: argmax of per-language stopword-hit scores,
    ties resolved by fixed language order (sorted codes, first wins) —
    the same CASE chain the DuckDB oracle evaluates.

    A narrow map over documents: no shuffle, no UDF; stopword lists are
    plan literals."""
    langs = sorted(LANG_STOPWORDS)
    scores = {lg: lang_score_expr(text_col, lg) for lg in langs}
    expr: Column = F.lit(langs[-1])
    # Build the when-chain back to front so earlier languages win ties.
    for lg in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lg:
                continue
            c = scores[lg] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lg)).otherwise(expr)
    return expr


def sql_lang_id_duckdb(text_col: str = "text") -> str:
    """DuckDB twin of :func:`lang_id_expr` (same chain, same tie-break)."""
    langs = sorted(LANG_STOPWORDS)

    def score(lg: str) -> str:
        lits = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lg])
        return (
            f"len(list_intersect(list_distinct(string_split(lower({text_col}), ' ')), "
            f"[{lits}]))"
        )

    cases = []
    for lg in langs[:-1]:
        conds = " AND ".join(
            f"{score(lg)} >= {score(other)}" for other in langs if other != lg
        )
        cases.append(f"WHEN {conds} THEN '{lg}'")
    return "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"


def quality_score_cols(text_col: str = "text") -> list[Column]:
    """Corpus quality signals: token count, mean token length, stopword
    ratio, and a composite 0/1 keep flag — the standard cheap filters
    applied before expensive model-based scoring.

    Ratios are integer-count divisions (deterministic doubles)."""
    toks = tokens(F.lower(F.col(text_col)))
    n_toks = F.size(toks)
    stop_lits = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_lits, t)))
    mean_tok_len = (
        (F.length(F.col(text_col)) - (n_toks - F.lit(1))).cast("double") / n_toks
    )
    stop_ratio = stop_hits.cast("double") / n_toks
    keep = (
        (n_toks >= 20) & (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    ).cast("int")
    return [
        n_toks.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        keep.alias("keep"),
    ]


def fingerprint_cols(text_col: str = "text") -> list[Column]:
    """Document fingerprints:

    - ``fp_md5``: md5 of whitespace-normalized lowercase text (exact-dup
      key after normalization);
    - ``fp_roll``: order-sensitive polynomial rolling hash over token
      hashes, folded left-to-right — content-defined, engine-portable
      (both engines reduce the token array sequentially).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    toks = tokens(norm)
    roll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 1_000_003 + stable_token_hash(t) % HM_MOD)
        % 2_147_483_647,
    )
    return [F.md5(norm).alias("fp_md5"), roll.alias("fp_roll")]


# --- Gopher-style repetition signals (shared by q_repetition_signals
# and q_curation_funnel — one definition keeps the standalone signal
# query and the funnel's 'repetition' stage bit-identical) -------------

REP_DUP_TOKEN_MAX = 0.6   # duplicate-token fraction threshold
REP_TOP_2GRAM_MAX = 0.2   # most-common-bigram fraction threshold

# Spark expression strings over a `toks` (array<string>) / `bg` column;
# kept as expr() text because higher-order lambdas read best in SQL form.
BIGRAMS_EXPR = (
    "zip_with(slice(toks, 1, size(toks) - 1),"
    "         slice(toks, 2, size(toks) - 1),"
    "         (a, b) -> concat(a, ' ', b))"
)
# Mode count as sort + longest-run fold: O(n log n) per row vs the
# naive distinct×filter scan's O(distinct·n) string comparisons — and
# higher-order functions evaluate INTERPRETED (CodegenFallback), so the
# constant factor of every avoided comparison is large (round-6 rework:
# q_repetition_signals warm median 16.7 s → 4.8 s on 50 K docs at sf1).
# The sentinel prev='' can never equal a real bigram ("w w" is
# non-empty). Same integer result, so the DuckDB twin is unchanged.
TOP_BIGRAM_COUNT_EXPR = (
    "aggregate(array_sort(bg),"
    " named_struct('prev', '', 'run', 0L, 'best', 0L),"
    " (acc, x) -> named_struct("
    "   'prev', x,"
    "   'run',  IF(x = acc.prev, acc.run + 1, 1L),"
    "   'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1L))),"
    " acc -> acc.best)"
)


def dup_token_frac_expr() -> Column:
    """(n - distinct tokens) / n over `toks`/`n` columns."""
    return (
        F.col("n") - F.size(F.array_distinct("toks"))
    ).cast("double") / F.col("n")


def top_bigram_frac_expr() -> Column:
    """Most-common-bigram count fraction over a `bg` column; 0.0 for
    single-token docs (no bigrams)."""
    return F.when(F.size("bg") == 0, F.lit(0.0)).otherwise(
        F.expr(TOP_BIGRAM_COUNT_EXPR).cast("double") / F.size("bg")
    )


def repetition_ok_expr() -> Column:
    """The composite repetition gate both queries share."""
    return (dup_token_frac_expr() <= REP_DUP_TOKEN_MAX) & (
        top_bigram_frac_expr() <= REP_TOP_2GRAM_MAX
    )


# DuckDB twins over the same staged names (toks/n/bg).
SQL_DUP_TOKEN_FRAC = "CAST(n - len(list_distinct(toks)) AS DOUBLE) / n"
SQL_TOP_BIGRAM_FRAC = (
    "CASE WHEN len(bg) = 0 THEN CAST(0.0 AS DOUBLE)"
    " ELSE CAST(list_max(list_transform(list_distinct(bg),"
    " x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg) END"
)
SQL_BIGRAMS = (
    "list_transform(range(len(string_split(lower(text), ' ')) - 1),"
    " i -> string_split(lower(text), ' ')[i+1] || ' ' ||"
    " string_split(lower(text), ' ')[i+2])"
)


def sql_repetition_ok_duckdb() -> str:
    return (
        f"(({SQL_DUP_TOKEN_FRAC}) <= {REP_DUP_TOKEN_MAX}"
        f" AND ({SQL_TOP_BIGRAM_FRAC}) <= {REP_TOP_2GRAM_MAX})"
    )


# --- Hashed linear quality classifier (fastText/CCNet-style shape) ---
#
# The model-based sibling of the heuristic rule sets (Gopher/C4): a
# linear text classifier over hashed bag-of-words features. Weights are
# INTEGER micro-units so per-document scores are exact integer sums —
# order-independent and bit-identical across engines (the same move as
# fixed-point PageRank). The weight of feature bucket b is derived from
# b itself by a Knuth-LCG mix, which stands in for a learned table with
# full value-oracle checkability; a real deployment swaps in learned
# weights via `classifier_score_with_table` (broadcast join — the
# distributed shape for weight tables too big to inline), which
# tests/test_quality_rules.py pins equal to the derived-weight fold.
CLF_N_BUCKETS = 1 << 20          # feature-hash space (fastText default)
CLF_MIX = 2654435761             # Knuth multiplicative-hash constant
CLF_WEIGHT_MOD = 1_000_003
CLF_WEIGHT_CENTER = 501_001      # weights span [-501001, 499001] ≈ ±0.5


def clf_bucket_expr(tok: Column) -> Column:
    """Feature-hash bucket of a token (engine-portable md5 base)."""
    return stable_token_hash(tok) % CLF_N_BUCKETS


def clf_weight_expr(bucket: Column) -> Column:
    """Integer micro-unit weight of a feature bucket. b < 2^20 and the
    mix constant < 2^32, so the product stays < 2^52 — exact int64 on
    both engines."""
    return (bucket * CLF_MIX) % CLF_WEIGHT_MOD - CLF_WEIGHT_CENTER


def classifier_score_cols(text_col: str = "text") -> list[Column]:
    """Row-local scorer: (n_tokens, score_sum, score_mean, keep).
    One scan, zero exchanges — token split → bucket → weight → integer
    fold, all whole-stage codegen; score_mean is ONE IEEE division of
    exact integers, so the full row is oracle-exact.

    Null text scores like empty text (coalesce to '' — ADVICE r12: the
    oracle's list_sum coalesce already treated null as score 0/keep 0;
    both sides now agree by construction)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != F.lit(""),
    )
    weights = F.transform(toks, lambda t: clf_weight_expr(clf_bucket_expr(t)))
    n = F.size(toks)
    ssum = F.aggregate(
        weights, F.lit(0).cast("long"), lambda a, x: a + x
    )
    return [
        n.cast("long").alias("n_tokens"),
        ssum.alias("score_sum"),
        F.when(n == 0, F.lit(None)).otherwise(
            ssum.cast("double") / n
        ).alias("score_mean"),
        (ssum > 0).cast("int").alias("keep"),
    ]


def classifier_score_with_table(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The LEARNED-table variant: explode tokens → hash to buckets →
    broadcast-join the (bucket, weight) table → integer sum per doc.
    Same output schema/values as classifier_score_cols when ``weights``
    contains clf_weight_expr(b) for every bucket (pinned in tests).

    Scale: the weight table is model-sized (2^20 rows ≈ 12 MB as two
    int64 columns — fastText-scale), independent of the corpus, so it
    BROADCASTS; the only shuffle is the groupBy(doc_id) whose rows are
    (id, weight) longs. Missing buckets score 0 (coalesce), matching a
    sparse learned table. Docs with zero tokens survive because
    explode_outer emits one null-token row per empty doc, which feeds
    the groupBy as count=0 / sum=0 (n_tokens=0, null mean)."""
    toks = docs.select(
        id_col,
        F.explode_outer(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
                lambda w: w != F.lit(""),
            )
        ).alias("_tok"),
    )
    scored = (
        toks.withColumn("_bucket", clf_bucket_expr(F.col("_tok")))
        .join(F.broadcast(weights), F.col("_bucket") == weights.bucket, "left")
        .groupBy(id_col)
        .agg(
            F.count("_tok").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("_tok").isNotNull(),
                             F.coalesce("weight", F.lit(0)))),
                F.lit(0),
            ).cast("long").alias("score_sum"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "score_sum",
        F.when(F.col("n_tokens") == 0, F.lit(None)).otherwise(
            F.col("score_sum").cast("double") / F.col("n_tokens")
        ).alias("score_mean"),
        (F.col("score_sum") > 0).cast("int").alias("keep"),
    )


# DuckDB twins (token t staged as toks)
SQL_CLF_WEIGHT = (
    f"((CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % {CLF_N_BUCKETS})"
    f" * {CLF_MIX}) % {CLF_WEIGHT_MOD} - {CLF_WEIGHT_CENTER}"
)


# --- Hashed n-gram LM perplexity filter (CCNet/KenLM shape) ---
#
# The third gate of the standard quality triad (after the heuristic
# rules — Gopher/C4 — and the linear classifier): an n-gram language-
# model score, the CCNet move (Wenzek et al. 2020: score every document
# with a KenLM 5-gram model trained on Wikipedia, then bucket the
# corpus into head/middle/tail by perplexity). Here the LM is a hashed
# BIGRAM log-probability table: each bigram feature-hashes into 2^20
# buckets and the bucket carries an integer micro-log10-prob derived by
# the same Knuth-LCG mix as the classifier — a deterministic stand-in
# for a trained KenLM table that keeps the FULL value oracle (exact
# int64 sums + one IEEE division). A real deployment swaps in learned
# log-probs exactly like classifier_score_with_table swaps in learned
# weights (broadcast join — the table is model-sized, ~12 MB,
# corpus-independent).
#
# Perplexity is reported in LOG space: logprob_mean is the mean log10
# probability per bigram (ppl = 10^-logprob_mean); bucketing compares
# exact integers (logprob_sum vs threshold·n) so head/middle/tail and
# keep are engine-exact without a cross-engine pow().
LM_N_BUCKETS = CLF_N_BUCKETS
LM_MIX = CLF_MIX
LM_LP_MOD = 7_000_001
LM_LP_FLOOR_MICRO = 1_000_000   # lp ∈ [-8_000_000, -1_000_000] µlog10
LM_HEAD_MEAN_MICRO = -4_400_000  # mean lp ≥ -4.4 → 'head'
LM_KEEP_MEAN_MICRO = -4_600_000  # mean lp ≥ -4.6 → kept ('middle')


def lm_logprob_from_bucket(bucket: Column) -> Column:
    """Integer micro-log10-prob of a feature bucket. bucket < 2^20 and
    the mix constant < 2^32 keep the product < 2^52 — exact int64 on
    both engines."""
    return -(F.lit(LM_LP_FLOOR_MICRO) + (bucket * LM_MIX) % LM_LP_MOD)


def lm_bigram_logprob_expr(gram: Column) -> Column:
    """Integer micro-log10-prob of one bigram (hash → bucket → table)."""
    return lm_logprob_from_bucket(stable_token_hash(gram) % LM_N_BUCKETS)


def lm_perplexity_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Row-local LM scorer: id → (n_bigrams, logprob_sum, logprob_mean,
    ppl_bucket, keep). One scan, ZERO exchanges — token split → bigram
    zip → bucket → log-prob → integer fold, all row-local array
    expressions; logprob_mean is ONE IEEE division of exact integers
    and the head/middle/tail cut compares exact integers
    (logprob_sum ≥ threshold·n), so every column is oracle-exact.

    STAGED selects on purpose: the token and bigram arrays are aliased
    in their own projections so every downstream reference reads the
    computed column instead of re-deriving it — CollapseProject keeps
    non-cheap multi-referenced aliases in separate Projects, while a
    single flat projection re-evaluates the interpreted
    split+filter+zip_with pipeline once PER REFERENCE (~20×/row;
    measured 22% slower at sf0.1). Same move as q_gopher_quality's
    staged metrics.

    Null text scores like empty text (coalesce — same contract as
    classifier_score_cols); docs with < 2 tokens have no bigrams:
    n_bigrams=0, logprob_sum=0, null mean/bucket, keep=0."""
    s1 = df.select(id_col, lm_tokens_expr(text_col).alias("_toks"))
    s2 = s1.select(
        id_col, lm_bigrams_from_toks(F.col("_toks")).alias("_grams")
    )
    s3 = s2.select(
        id_col,
        F.size("_grams").cast("long").alias("n_bigrams"),
        F.aggregate(
            F.transform("_grams", lm_bigram_logprob_expr),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("logprob_sum"),
    )
    return s3.select(
        id_col,
        "n_bigrams",
        "logprob_sum",
        *lm_metric_cols(F.col("n_bigrams"), F.col("logprob_sum")),
    )


# DuckDB twin (bigram g staged in a grams list)
SQL_LM_LOGPROB = (
    f"-({LM_LP_FLOOR_MICRO} + ((CAST('0x' || substring(md5(g), 1, 15)"
    f" AS BIGINT) % {LM_N_BUCKETS}) * {LM_MIX}) % {LM_LP_MOD})"
)


def lm_tokens_expr(text_col: str = "text") -> Column:
    """Filtered lowercase token array for the LM gate; null text
    tokenizes like empty text (same contract as the classifier).
    ALWAYS stage this behind an alias before multi-referencing it —
    the split+filter re-evaluates per reference otherwise."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != F.lit(""),
    )


def lm_bigrams_from_toks(toks: Column) -> Column:
    """Bigram array over an already-staged token COLUMN (cheap to
    reference repeatedly). Empty and single-token docs yield an EMPTY
    array; the <2-token CASE branch keeps the negative-length slice
    unevaluated (CASE is lazy per row). Shared by the fold, the
    learned-table variant, and the streaming gate so the feature
    extraction cannot drift between paths."""
    n_toks = F.size(toks)
    return F.when(
        n_toks >= 2,
        F.zip_with(
            F.slice(toks, 1, n_toks - 1),
            F.slice(toks, 2, n_toks - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lm_metric_cols(
    n: Column, ssum: Column
) -> list[Column]:
    """The LM gate's derived columns from exact (n_bigrams,
    logprob_sum) integers — shared by the row-local fold and the
    broadcast-table variant so the two paths cannot drift."""
    head_cut = F.lit(LM_HEAD_MEAN_MICRO).cast("long") * n
    keep_cut = F.lit(LM_KEEP_MEAN_MICRO).cast("long") * n
    return [
        F.when(n == 0, F.lit(None)).otherwise(
            ssum.cast("double") / (n * F.lit(1_000_000))
        ).alias("logprob_mean"),
        F.when(n == 0, F.lit(None).cast("string"))
        .when(ssum >= head_cut, F.lit("head"))
        .when(ssum >= keep_cut, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
        ((n > 0) & (ssum >= keep_cut)).cast("int").alias("keep"),
    ]


#: Backoff micro-log10-prob for bigram buckets ABSENT from the learned
#: table: one µunit below the derived family's floor (-(FLOOR+MOD) =
#: -8_000_001, strictly lower than every representable table value), so
#: an unseen bigram pulls a doc toward 'tail'/drop — the direction a
#: real sparse KenLM backoff takes. ADVICE r13: the previous coalesce
#: to 0 meant probability 1 — unseen bigrams scored as PERFECT and
#: pulled docs toward 'head'/keep, inverted backoff semantics.
LM_BACKOFF_MICRO = -(LM_LP_FLOOR_MICRO + LM_LP_MOD)


def lm_score_with_table(
    docs: DataFrame,
    logprobs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff_micro: int = LM_BACKOFF_MICRO,
) -> DataFrame:
    """The LEARNED-LM variant of :func:`lm_perplexity_frame`: explode
    bigrams → hash to buckets → broadcast-join a (bucket, logprob)
    table → exact integer sum per doc. Same output schema/values as
    the derived fold when ``logprobs`` holds the derived micro-log10
    value for every bucket the corpus touches (pinned in
    tests/test_lm_perplexity.py) — the drop-in seam for a REAL KenLM
    table quantized to integer micro-units.

    Scale: same posture as classifier_score_with_table — the table is
    model-sized (2^20 rows ≈ 12 MB as two int64 columns),
    corpus-independent, so it BROADCASTS; the only shuffle is the
    groupBy(id) whose rows are (id, logprob) longs. Missing buckets
    score ``backoff_micro`` (default LM_BACKOFF_MICRO, one µunit below
    the table's floor — a sparse table's backoff must penalize unseen
    bigrams, never reward them; pass 0 only if you explicitly want
    'treat unseen as perfect'); docs with no bigrams survive via
    explode_outer's null row (count=0, sum=0, null mean/bucket,
    keep=0)."""
    grams = docs.select(
        id_col, lm_tokens_expr(text_col).alias("_toks")
    ).select(
        id_col, F.explode_outer(lm_bigrams_from_toks(F.col("_toks"))).alias("_g")
    )
    scored = (
        grams.withColumn(
            "_bucket", stable_token_hash(F.col("_g")) % LM_N_BUCKETS
        )
        .join(
            F.broadcast(logprobs),
            F.col("_bucket") == logprobs.bucket,
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count("_g").cast("long").alias("n_bigrams"),
            F.coalesce(
                F.sum(F.when(F.col("_g").isNotNull(),
                             F.coalesce("logprob",
                                        F.lit(backoff_micro)))),
                F.lit(0),
            ).cast("long").alias("logprob_sum"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "logprob_sum",
        *lm_metric_cols(F.col("n_bigrams"), F.col("logprob_sum")),
    )


def with_lm_keep(
    df: DataFrame, text_col: str = "text", out_col: str = "lm_keep"
) -> DataFrame:
    """Append the LM gate's 0/1 keep decision as ``out_col`` while
    carrying every existing column — the streaming-gate layout (a
    stream filter needs the decision NEXT TO the payload, not the
    metrics-only frame lm_perplexity_frame returns). Stateless
    projections, so it composes into a streaming pre-state gate; the
    decision is defined by the same shared exprs as the batch fold
    (lm_tokens_expr → lm_bigrams_from_toks → lm_metric_cols), pinned
    equal in tests. Same staging discipline: tokens and bigrams are
    aliased once per row, then dropped."""
    staged = df.withColumn("_lm_toks", lm_tokens_expr(text_col)).withColumn(
        "_lm_grams", lm_bigrams_from_toks(F.col("_lm_toks"))
    )
    n = F.size("_lm_grams").cast("long")
    ssum = F.aggregate(
        F.transform("_lm_grams", lm_bigram_logprob_expr),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    keep = lm_metric_cols(n, ssum)[2]  # the 'keep' column
    return staged.withColumn(out_col, keep).drop("_lm_toks", "_lm_grams")


# --- BPE merge learning (tokenizer training) ---------------------------
#
# Classic byte-pair encoding (Sennrich et al. 2016, the public
# subword-nmt algorithm): start from words segmented into characters,
# then K times (count adjacent symbol pairs weighted by word frequency
# → take the most frequent pair, ties broken lexicographically → merge
# every non-overlapping left-to-right occurrence). The reference engine
# has no tokenizer training at all — this is north-star LLM-pipeline
# surface, the actual vocabulary-LEARNING step upstream of q_vocab_ids'
# frequency-ranked id assignment and q_encode_tokens' encode pass.
#
# Segmentations are carried as a WRAPPED STRING: every symbol is
# enclosed as "\x01<sym>\x02", so applying merge (a, b) is a plain
# non-regex replace of "\x01a\x02\x01b\x02" with "\x01ab\x02" — and
# because adjacent wrapped symbols share no characters, SQL replace's
# left-to-right non-overlapping scan IS exactly BPE's greedy merge
# order, identically on Spark, DuckDB, and Python str.replace. A merge
# can never re-fire on its own output within a round (a||b = a needs
# an empty right symbol). Precondition: the sentinel bytes \x01/\x02
# do not appear in the corpus alphabet (a deployment over arbitrary
# bytes would pick two unused codepoints).
BPE_NUM_MERGES = 8
BPE_WRAP_L = "\x01"
BPE_WRAP_R = "\x02"
#: Vocabularies at or under this many distinct words train in one
#: exact driver-side pass (same guarded small-side fast path as
#: pagerank's PR_SMALL_GRAPH_EDGES; the distributed loop is pinned
#: bit-identical by forcing small_vocab_words=0 in tests). The merge
#: loop's input is the DISTINCT-WORD table, bounded by morphology
#: (~1e6-1e7 rows regardless of corpus bytes), not the corpus.
BPE_SMALL_VOCAB_WORDS = 1_000_000


def bpe_wrap_word_expr(word: Column | str) -> Column:
    """word → initial wrapped-character segmentation string."""
    c = F.col(word) if isinstance(word, str) else word
    return F.array_join(
        F.transform(
            F.split(c, ""),
            lambda ch: F.concat(F.lit(BPE_WRAP_L), ch, F.lit(BPE_WRAP_R)),
        ),
        "",
    )


def _bpe_pairs_expr(seg: Column) -> Column:
    """Adjacent symbol pairs of a wrapped segmentation string, as an
    array of (lsym, rsym) structs (empty for single-symbol words)."""
    syms = F.split(F.btrim(seg, F.lit(BPE_WRAP_L + BPE_WRAP_R)),
                   BPE_WRAP_R + BPE_WRAP_L)
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("lsym"),
                F.element_at(syms, i + 1).alias("rsym"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lsym:string,rsym:string>>"))


def _bpe_local_full(
    words: list[tuple[str, int]], k: int
) -> tuple[list[tuple], list[tuple[str, int]]]:
    """Exact driver-side BPE over a bounded (word, freq) list — the
    same wrapped-string replace semantics as the distributed loop and
    the unrolled DuckDB oracle, so all three are bit-identical.
    Returns (merges, final_segs) where final_segs carries each input
    word's post-merge wrapped segmentation with its frequency — the
    free by-product the vocabulary derivation needs (see
    bpe_vocab_from_segs), so callers never re-run the k replace rounds.
    """
    segs = [
        ("".join(BPE_WRAP_L + ch + BPE_WRAP_R for ch in w), f)
        for w, f in words
    ]
    out = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for seg, f in segs:
            syms = seg[1:-1].split(BPE_WRAP_R + BPE_WRAP_L)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            raise ValueError(
                f"bpe_learn_merges: corpus exhausted pairs after "
                f"{rank - 1} merges (asked for {k})"
            )
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        pat = BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R
        rep = BPE_WRAP_L + a + b + BPE_WRAP_R
        segs = [(seg.replace(pat, rep), f) for seg, f in segs]
        out.append((rank, a, b, a + b, n))
    return out, segs


def _bpe_local(words: list[tuple[str, int]], k: int) -> list[tuple]:
    """Merge list only — see _bpe_local_full."""
    return _bpe_local_full(words, k)[0]


def bpe_vocab_from_segs(segs: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """Final vocabulary from post-merge word segmentations: every
    surviving symbol with its exact corpus occurrence count
    (word frequency × in-word count — the q_bpe_vocab contract),
    ordered by (count desc, symbol asc), the q_vocab_ids ranking
    discipline. Pure integer fold, order-independent, so it is
    bit-identical to the distributed explode+groupBy derivation."""
    counts: dict[str, int] = {}
    for seg, f in segs:
        for sym in seg[1:-1].split(BPE_WRAP_R + BPE_WRAP_L):
            counts[sym] = counts.get(sym, 0) + f
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


BPE_MERGES_SCHEMA = (
    "merge_rank long, lsym string, rsym string, merged string, "
    "pair_count long"
)
_BPE_MERGES_COLS = ["merge_rank", "lsym", "rsym", "merged", "pair_count"]


def bpe_train(
    words: DataFrame,
    k: int = BPE_NUM_MERGES,
    *,
    small_vocab_words: int | None = None,
) -> tuple[list[tuple], list[tuple[str, int]] | None]:
    """Learn the first ``k`` BPE merge rules from a (word, freq) table.

    Returns ``(merges, final_segs)``: merges is the ordered k-item rule
    list (merge_rank, lsym, rsym, merged, pair_count); final_segs is
    each distinct word's post-merge wrapped segmentation with its
    frequency when the driver-side small-vocab path ran, else None —
    the free by-product that lets vocabulary/ids queries derive the
    final vocabulary with ZERO additional corpus or vocabulary jobs
    (bpe_vocab_from_segs). Pair counts are exact int64 sums of word
    frequencies, so the argmax-with-lexicographic-tie-break is
    deterministic and engine-exact (the PageRank/k-means
    integer-exactness discipline); headroom: counts ≤ corpus token
    count, far inside int64.

    Scale: the caller's corpus-sized work (the word count) has already
    collapsed the input to the DISTINCT-WORD relation, bounded by
    morphology — so like pagerank, small vocabularies (≤
    ``small_vocab_words``, default BPE_SMALL_VOCAB_WORDS) train in one
    exact driver-side pass, and larger ones run the distributed loop:
    per round, ONE vocabulary-scale job (explode pairs → partial-agg'd
    groupBy(lsym, rsym) → TakeOrdered(1) argmax) plus a map-only
    re-segmentation persisted for the next round (persist rotates —
    the previous round's cache is released as soon as its successor
    materializes, keeping O(vocab) not O(k·vocab) memory).

    The size probe is a ``limit(small_vocab_words + 1).toPandas()``
    over the persisted relation, not a count-then-collect: on the
    small path the probe's single job IS the collection (one job where
    count+toPandas was two), and on the large path the limit stops
    scheduling partitions once it has enough rows, the partitions it
    did compute land in the cache, and the loop's first action
    materializes the rest — no double compute on either path."""
    from pyspark import StorageLevel

    if small_vocab_words is None:
        small_vocab_words = BPE_SMALL_VOCAB_WORDS

    cached = words.select("word", "freq").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        pdf = cached.limit(small_vocab_words + 1).toPandas()
    except Exception:
        cached.unpersist()
        raise

    if len(pdf) <= small_vocab_words:
        cached.unpersist()
        return _bpe_local_full(
            list(zip(pdf["word"].tolist(), (int(x) for x in pdf["freq"]))), k
        )

    # Keep a handle to the persisted (word, freq) frame: ``cur`` is about
    # to be reassigned to the derived seg projection, and without the
    # handle the original MEMORY_AND_DISK cache (up to ~1e7 rows on this
    # path) would never be unpersisted (ADVICE r14). Round 1 is its last
    # reader, so it is released as soon as round 1's successor
    # materializes (the same rotation discipline as ``prev``).
    base = cached
    cur = cached.select("freq", bpe_wrap_word_expr("word").alias("seg"))
    merges = []
    prev = None
    try:
        for rank in range(1, k + 1):
            best = (
                cur.select("freq", F.explode(_bpe_pairs_expr(F.col("seg"))).alias("pr"))
                .groupBy("pr.lsym", "pr.rsym")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("lsym").asc(), F.col("rsym").asc())
                .limit(1)
                .collect()
            )
            if not best:
                raise ValueError(
                    f"bpe_learn_merges: corpus exhausted pairs after "
                    f"{rank - 1} merges (asked for {k})"
                )
            a, b, n = best[0].lsym, best[0].rsym, int(best[0].n)
            merges.append((rank, a, b, a + b, n))
            pat = BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R
            rep = BPE_WRAP_L + a + b + BPE_WRAP_R
            nxt = cur.select(
                "freq", F.replace("seg", F.lit(pat), F.lit(rep)).alias("seg")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()
            if base is not None:
                base.unpersist()
                base = None
            if prev is not None:
                prev.unpersist()
            prev, cur = cur, nxt
    finally:
        if base is not None:
            base.unpersist()
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return merges, None


def bpe_learn_merges(
    words: DataFrame,
    k: int = BPE_NUM_MERGES,
    *,
    small_vocab_words: int | None = None,
) -> DataFrame:
    """The k learned merge rules as a DataFrame (merge_rank, lsym,
    rsym, merged, pair_count) — bpe_train's rule list lifted over the
    Arrow local-DF path (LocalTableScan; see arrow_local_df). Callers
    that only need the rules as PLAN LITERALS should call bpe_train
    directly and skip the DataFrame round-trip."""
    merges, _ = bpe_train(words, k, small_vocab_words=small_vocab_words)
    return arrow_local_df(
        words.sparkSession, merges, BPE_MERGES_SCHEMA, _BPE_MERGES_COLS
    )


def bpe_apply_merges_expr(text_col: str, merges: list[tuple]) -> Column:
    """Segment a document with a LEARNED merge list: every word wrapped
    to its character segmentation, words joined with a space (merges
    never cross word boundaries — the space breaks wrapped-symbol
    adjacency), then the K merge rules replayed IN LEARNED ORDER as
    non-regex replaces — the same greedy semantics the trainer used.
    Returns the final wrapped segmentation string; row-local, zero
    exchanges, whole corpus in one map.

    ``merges``: rows of (merge_rank, lsym, rsym, merged, n) as returned
    by :func:`bpe_learn_merges` (rank order is applied order)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    seg = F.array_join(F.transform(toks, _wrap_symbolwise), " ")
    for r in sorted(merges, key=lambda r: r[0]):
        _, a, b, _, _ = r
        seg = F.replace(
            seg,
            F.lit(BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R),
            F.lit(BPE_WRAP_L + a + b + BPE_WRAP_R),
        )
    return seg


def _wrap_symbolwise(word: Column) -> Column:
    return F.array_join(
        F.transform(
            F.split(word, ""),
            lambda ch: F.concat(F.lit(BPE_WRAP_L), ch, F.lit(BPE_WRAP_R)),
        ),
        "",
    )


def bpe_encode_cols(seg: Column) -> list[Column]:
    """Per-document encode metrics from a final wrapped segmentation:
    subword-token count (one ``\\x01`` per symbol), word count, and an
    md5 fingerprint that pins the EXACT segmentation (so the oracle
    compare proves the full token sequence, not just counts)."""
    n_sub = (
        F.length(seg) - F.length(F.replace(seg, F.lit(BPE_WRAP_L), F.lit("")))
    ).cast("long")
    n_words = F.when(
        F.length(seg) == 0, F.lit(0)
    ).otherwise(
        F.length(seg) - F.length(F.replace(seg, F.lit(" "), F.lit(""))) + 1
    ).cast("long")
    return [
        n_words.alias("n_words"),
        n_sub.alias("n_subwords"),
        F.md5(seg).alias("seg_fp"),
    ]
