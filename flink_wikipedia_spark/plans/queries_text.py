"""Text-analysis queries over the `documents` table (north star E3/E4 +
language-ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import dec_avg, stable_token_hash, sql_dec_sum_duckdb
from flink_wikipedia_spark.functions.constants import HM_MOD
from flink_wikipedia_spark.operators.text import (
    BIGRAMS_EXPR,
    BPE_ISH_PATTERN,
    BPE_NUM_MERGES,
    bpe_learn_merges,
    LM_HEAD_MEAN_MICRO,
    LM_KEEP_MEAN_MICRO,
    SQL_BIGRAMS,
    SQL_CLF_WEIGHT,
    SQL_LM_LOGPROB,
    SQL_DUP_TOKEN_FRAC,
    SQL_TOP_BIGRAM_FRAC,
    classifier_score_cols,
    dup_token_frac_expr,
    fingerprint_cols,
    lang_id_expr,
    lm_perplexity_frame,
    with_lm_keep,
    quality_score_cols,
    repetition_ok_expr,
    sql_lang_id_duckdb,
    sql_repetition_ok_duckdb,
    token_count_cols,
    top_bigram_frac_expr,
    word_counts,
)
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread


@query(
    "q_word_count",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: the classic — explode + hash-aggregate (operators/text.word_counts)."""
    return word_counts(load_table(spark, sf_dir, "documents"))


@query(
    "q_lang_stats",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs,
           {sql_dec_sum_duckdb("n_chars")} / COUNT(n_chars) AS avg_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: per-language corpus stats."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dec_avg("n_chars").alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}')) AS n_bpe_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star (token counting): whitespace + BPE-ish regex token
    counts per document — the budget arithmetic of corpus curation."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *token_count_cols())


@query(
    "q_lang_id",
    oracle=f"""
    SELECT doc_id, lang, {sql_lang_id_duckdb('text')} AS predicted_lang
    FROM documents
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star (language ID): stopword-hit argmax with fixed
    tie-break; Spark when-chain ≡ oracle CASE chain by construction
    (operators/text.lang_id_expr)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id_expr().alias("predicted_lang"))


@query(
    "q_quality_score",
    oracle="""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_tokens,
           CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS mean_token_len,
           CAST(len(list_filter(string_split(lower(text), ' '),
                t -> list_contains(['the','a','and','of','to','in','is','it'], t))) AS DOUBLE)
               / len(string_split(lower(text), ' ')) AS stopword_ratio,
           CAST(len(string_split(lower(text), ' ')) >= 20
                AND (CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
                     / len(string_split(lower(text), ' '))) BETWEEN 2.0 AND 12.0
                AS INT) AS keep
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star (quality scoring): cheap-pass corpus filters — token
    count, mean token length, stopword ratio, composite keep flag
    (operators/text.quality_score_cols)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_score_cols())


@query(
    "q_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_md5,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                       t -> CAST('0x' || substring(md5(t),1,15) AS BIGINT) % {HM_MOD})),
               (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp_roll
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star (fingerprinting): md5-of-normalized-text exact-dup key
    + left-fold polynomial rolling hash over md5-derived token hashes —
    both engine-portable (operators/text.fingerprint_cols)."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return docs.select("doc_id", *fingerprint_cols())


@query(
    "q_bigram_counts",
    oracle="""
    SELECT lang, bigram, COUNT(*) AS n
    FROM (
        SELECT lang,
               unnest(list_transform(
                   range(len(string_split(lower(text), ' ')) - 1),
                   i -> string_split(lower(text), ' ')[i+1] || ' ' ||
                        string_split(lower(text), ' ')[i+2])) AS bigram
        FROM documents
    )
    WHERE bigram <> '' AND bigram NOT LIKE ' %' AND bigram NOT LIKE '% '
    GROUP BY lang, bigram
    HAVING COUNT(*) >= 5
    """,
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram statistics (bigrams per language): adjacent-token pairs
    built with array higher-order functions (zip of the token array with
    its own tail), then the standard explode→count. The n-gram
    construction is a narrow map — only the count shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array FIRST: referencing the split(...) tree
    # inside the lambda would re-evaluate it per element access (observed
    # 3.4 s → <1 s at sf0.1 from this two-step projection)
    # single-token docs must produce NO bigrams: sequence(1, 0) is
    # DESCENDING in Spark ([1, 0]) and would emit the lone token twice
    # via concat_ws's null-skipping — filter size ≥ 2 first, matching
    # the oracle's empty range(len-1)
    with_toks = docs.select(
        "lang", F.split(F.lower(F.col("text")), " ").alias("_toks")
    ).filter(F.size("_toks") >= 2)
    toks = F.col("_toks")
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.get(toks, i - 1), F.get(toks, i)),
    )
    return (
        with_toks.select("lang", F.explode(bigrams).alias("bigram"))
        .filter(
            (F.col("bigram") != "")
            & ~F.col("bigram").startswith(" ")
            & ~F.col("bigram").endswith(" ")
        )
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


@query(
    "q_zscore_docs",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           (d.n_chars - mu)
             / (CASE WHEN sqrt(msq - mu * mu) = 0.0 THEN 1.0
                     ELSE sqrt(msq - mu * mu) END) AS z
    FROM documents d
    JOIN (
        SELECT lang,
               CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS mu,
               CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*) AS msq
        FROM documents GROUP BY lang
    ) s ON s.lang = d.lang
    """,
)
def q_zscore_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length, all built-in expressions
    (stays in whole-stage codegen; no Python in the path). Two-pass
    plan, not a window over partitionBy(lang): the stats aggregate
    collapses map-side to |langs| rows before its shuffle, then joins
    back — AQE broadcasts the tiny stats side — so document rows are
    never shuffled by the low-cardinality (skew-prone) lang key.

    Determinism: mean/variance from exact decimal sums of n_chars and
    n_chars² (not stddev_pop, whose merge order is partition-dependent),
    then identical IEEE double expressions (/, *, -, sqrt are correctly
    rounded) in Spark and DuckDB ⇒ bit-equal z. σ=0 groups divide by
    1.0 (z=0), matching the prior UDF's behavior."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d38 = F.col("n_chars").cast("decimal(38,0)")
    stats = docs.groupBy("lang").agg(
        (F.sum(d38).cast("double") / F.count(F.lit(1))).alias("mu"),
        (F.sum(d38 * d38).cast("double") / F.count(F.lit(1))).alias("msq"),
    )
    sd = F.sqrt(F.col("msq") - F.col("mu") * F.col("mu"))
    return docs.join(stats, "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        (
            (F.col("n_chars") - F.col("mu"))
            / F.when(sd == 0.0, F.lit(1.0)).otherwise(sd)
        ).alias("z"),
    )


@query(
    "q_kmeans_doclen",
    oracle="""
    WITH RECURSIVE lens AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents
    ), iter AS (
        SELECT lang,
               MIN(x) AS s0, CAST(1 AS BIGINT) AS n0,
               MAX(x) AS s1, CAST(1 AS BIGINT) AS n1,
               CAST(0 AS BIGINT) AS a0, CAST(0 AS BIGINT) AS a1,
               0 AS it
        FROM lens GROUP BY lang
      UNION ALL
        SELECT lang,
               CASE WHEN cnt0 > 0 THEN sum0 ELSE s0 END,
               CASE WHEN cnt0 > 0 THEN cnt0 ELSE n0 END,
               CASE WHEN cnt1 > 0 THEN sum1 ELSE s1 END,
               CASE WHEN cnt1 > 0 THEN cnt1 ELSE n1 END,
               cnt0, cnt1, it + 1
        FROM (
            SELECT z.lang, z.s0, z.n0, z.s1, z.n1, z.it,
                   CAST(SUM(CASE WHEN near1 THEN 0 ELSE x END) AS BIGINT)
                       AS sum0,
                   CAST(COUNT(CASE WHEN near1 THEN NULL ELSE 1 END)
                       AS BIGINT) AS cnt0,
                   CAST(SUM(CASE WHEN near1 THEN x ELSE 0 END) AS BIGINT)
                       AS sum1,
                   CAST(COUNT(CASE WHEN near1 THEN 1 ELSE NULL END)
                       AS BIGINT) AS cnt1
            FROM (
                SELECT i.lang, i.s0, i.n0, i.s1, i.n1, i.it, d.x,
                       abs(d.x * i.n1 - i.s1) * i.n0
                           < abs(d.x * i.n0 - i.s0) * i.n1 AS near1
                FROM iter i JOIN lens d USING (lang)
                WHERE i.it < 10
            ) z
            GROUP BY 1, 2, 3, 4, 5, 6
        ) a
    )
    SELECT lang,
           CAST(s0 AS DOUBLE) / n0 AS c_small,
           CAST(s1 AS DOUBLE) / n1 AS c_large,
           a0 AS n_small,
           a1 AS n_large
    FROM iter WHERE it = 10
    """,
)
def q_kmeans_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine UDF surface (SURVEY.md §2.2 'UDF/UDAF/UDTF'): grouped
    applyInPandas doing something built-ins genuinely cannot — an
    ITERATIVE algorithm per group. 1-D Lloyd's k-means (k=2) over
    document lengths per language: centroids init at group min/max,
    exactly 10 assignment/update sweeps.

    r13 upgrade — FULL value oracle via exact rational centroids (the
    same integer-exactness move as fixed-point PageRank, r12): each
    centroid is carried as an exact (sum, count) pair and the
    assignment comparison |x−s0/n0| vs |x−s1/n1| cross-multiplies to
    pure int64 arithmetic (|x·n1−s1|·n0 < |x·n0−s0|·n1, ties to the
    small cluster; magnitudes ≤ ~5e16 at sf100, safely exact), so
    every sweep is order-independent and engine-exact; the output
    means are ONE IEEE division each. The DuckDB twin replays the
    identical iteration as a recursive CTE — the r12 PageRank oracle
    pattern — retiring this query from the rows-only class.

    This remains the legitimate grouped-map shape: a whole-group
    fixpoint loop, not a SQL aggregate. Arrow-batched; groups are
    per-language so each fits one batch (~1 M rows/lang at sf100)."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def kmeans2(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].to_numpy(dtype="int64")
        # loud headroom guard: |x·n−s|·n ≤ 2·max(x)·n² must fit int64 —
        # numpy overflow WRAPS silently where DuckDB errors, and a
        # silent wrap would be a value divergence, not a crash
        if 2 * int(x.max()) * len(x) * len(x) > 2**62:
            raise ValueError(
                "kmeans2: int64 headroom exceeded for this group "
                f"(n={len(x)}, max={int(x.max())})"
            )
        s0, n0 = int(x.min()), 1
        s1, n1 = int(x.max()), 1
        a0, a1 = 0, 0
        for _ in range(10):
            near1 = np.abs(x * n1 - s1) * n0 < np.abs(x * n0 - s0) * n1
            a0, a1 = int((~near1).sum()), int(near1.sum())
            if a0:
                s0, n0 = int(x[~near1].sum()), a0
            if a1:
                s1, n1 = int(x[near1].sum()), a1
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "c_small": [s0 / n0],
                "c_large": [s1 / n1],
                "n_small": [a0],
                "n_large": [a1],
            }
        )

    return docs.groupBy("lang").applyInPandas(
        kmeans2, "lang string, c_small double, c_large double, n_small long, n_large long"
    )


@query(
    "q_top_tokens_per_lang",
    oracle="""
    SELECT lang, token, n, rk FROM (
        SELECT lang, token, n,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rk
        FROM (
            SELECT lang, token, COUNT(*) AS n
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
            WHERE token <> ''
            GROUP BY lang, token
        )
    ) WHERE rk <= 5
    """,
)
def q_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3+E4 composed: per-language token frequency, then ranked top-5 —
    explode → two-key aggregate → ranked window on the lang partition."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return counts.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= 5
    )


@query(
    "q_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf_cnt
        FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    doclen AS (SELECT doc_id, SUM(tf_cnt) AS n_toks FROM tf GROUP BY doc_id),
    dfreq AS (SELECT token, COUNT(*) AS df_cnt FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.token,
               (CAST(t.tf_cnt AS DOUBLE) / l.n_toks)
               * ((n.n_docs - d.df_cnt + 0.5) / (d.df_cnt + 0.5)) AS score
        FROM tf t
        JOIN doclen l ON l.doc_id = t.doc_id
        JOIN dfreq d ON d.token = t.token
        CROSS JOIN n
    )
    SELECT doc_id, token, score FROM (
        SELECT doc_id, token, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term salience: top-3 distinguishing terms per document.

    idf is the BM25 odds-ratio form (N - df + 0.5)/(df + 0.5) — on
    purpose log-free: tf, idf, and their product are all single IEEE
    divisions/multiplications of integer-derived doubles, which two
    independent engines compute bit-identically, whereas ln() is a
    libm call with no cross-engine exactness guarantee. Same ranking
    monotonicity as log-idf (the odds ratio is monotone in df).

    Scale: ONE explode feeds ONE tf aggregate; doclen and df are
    WINDOWS over the aggregated tf rows (sum over doc_id, count over
    token) — the groupBy-and-join-back form re-planned the tf subtree
    three times, re-tokenizing the corpus per derived relation
    (3 scans, 3.4× the fresh-plan cost; Catalyst does not CSE logical
    subtrees across joins). The token window sees the same Zipf skew
    the join-on-token form shuffled anyway. One broadcast single-row
    corpus count, per-doc window top-k; no shuffle carries raw text,
    only (doc_id, token) pairs."""
    from pyspark.sql import Window

    # Plain load_table on purpose (r16): the r15 spread shuffled full
    # document text through the round-robin exchange (shuffle 4.87 →
    # 7.46 MB, executor CPU 8×) for ~0.1 s same-session wall, and the
    # driver bench regressed 11 % — wrong side of the trade.
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf_cnt"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf2 = tf.withColumn(
        "n_toks", F.sum("tf_cnt").over(Window.partitionBy("doc_id"))
    ).withColumn("df_cnt", F.count(F.lit(1)).over(Window.partitionBy("token")))
    scored = tf2.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "token",
        (
            (F.col("tf_cnt").cast("double") / F.col("n_toks"))
            * (
                (F.col("n_docs") - F.col("df_cnt") + F.lit(0.5))
                / (F.col("df_cnt") + F.lit(0.5))
            )
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "score")
    )


# Document chunking constants: 64-token windows, stride 48 (16-token
# overlap) — the context-window prep step of an LLM training pipeline.
CHUNK_W = 64
CHUNK_S = 48


@query(
    "q_doc_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, n_tokens,
               1 + (GREATEST(0, n_tokens - {CHUNK_W}) + {CHUNK_S - 1}) // {CHUNK_S}
                 AS n_chunks
        FROM t
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(i * {CHUNK_S} AS BIGINT) AS chunk_start,
           CAST(len(toks[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(toks[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}], ' ')
             AS chunk_text
    FROM c, UNNEST(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) AS u(i)
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: split every document into overlapping
    token windows (W=64, stride=48) — the context-window prep that
    feeds tokenization/packing. One doc row → ceil chunks rows.

    Scale: pure generate — sequence+explode+slice are codegen
    expressions, the fan-out happens inside the scan partition with NO
    shuffle and no Python; output is ~n_tokens/stride rows per doc.
    At 100 TB this is the shape you want: chunking is embarrassingly
    parallel and stays that way here. Stride < window guarantees the
    last chunk is non-empty (start ≤ n_tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    with_t = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).withColumn(
        "n_chunks",
        F.expr(
            f"1 + (greatest(0L, n_tokens - {CHUNK_W}) + {CHUNK_S - 1}) div {CHUNK_S}"
        ),
    )
    chunk = F.slice(
        F.col("toks"), (F.col("chunk_idx") * CHUNK_S + 1).cast("int"), CHUNK_W
    )
    return (
        with_t.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * CHUNK_S).alias("chunk_start"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


# Contamination check: 5-token shingles, benchmark = every 97th doc.
NGRAM_N = 5
CONTAM_BENCH_MOD = 97
CONTAM_THRESHOLD = 0.2

# DuckDB twin of operators.text.stable_token_hash
_SQL_HASH = "CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


@query(
    "q_contamination_check",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               {_SQL_HASH.format(expr=f"array_to_string(toks[i + 1 : i + {NGRAM_N}], ' ')")} AS h
        FROM t, UNNEST(generate_series(0, CAST(n_tokens - {NGRAM_N} AS BIGINT))) AS u(i)
        WHERE n_tokens >= {NGRAM_N}
    ),
    corpus AS (
        SELECT DISTINCT doc_id, h FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
    ),
    bench AS (
        SELECT DISTINCT h FROM grams WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    ),
    shared AS (
        SELECT c.doc_id, COUNT(*) AS n_shared
        FROM corpus c JOIN bench b ON c.h = b.h
        GROUP BY c.doc_id
    ),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_ngrams FROM corpus GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
           CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / p.n_ngrams AS overlap_frac,
           CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / p.n_ngrams
             >= {CONTAM_THRESHOLD} AS contaminated
    FROM per_doc p LEFT JOIN shared s ON s.doc_id = p.doc_id
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screening: for every training document,
    the fraction of its distinct 5-token shingles that appear anywhere
    in a held-out benchmark set (deterministic stand-in: every 97th
    doc), with a keep/drop flag at 20% overlap — the eval-leakage
    filter every serious pretraining pipeline runs.

    Scale: shingles are hashed to 60-bit longs (stable_token_hash)
    BEFORE any shuffle — the wire carries 8-byte keys, never text.
    Per-doc dedup is array_distinct inside the row (no shuffle); the
    benchmark side is ~1% of the corpus so its distinct-hash set stays
    broadcastable (AQE decides); the only large shuffle is the final
    groupBy(doc_id), which is uniform by construction."""
    from flink_wikipedia_spark.functions.compat import stable_token_hash

    docs = load_table_spread(spark, sf_dir, "documents")
    # materialize the token array FIRST (same lesson as q_bigram_counts:
    # a split() tree referenced inside the lambda re-evaluates per access)
    tcol = F.col("toks")
    grams_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(tcol).cast("long") - NGRAM_N),
        lambda i: F.concat_ws(
            " ", *[F.get(tcol, (i + k).cast("int")) for k in range(NGRAM_N)]
        ),
    )
    # explode_outer, not explode: explode makes Catalyst infer a
    # size(grams)>0 predicate and push it BELOW the toks projection,
    # re-inlining split(lower(text)) into every lambda element access —
    # O(tokens²) per doc (observed 15 s → ~2 s at sf0.1). The size ≥ N
    # filter already guarantees non-empty gram arrays, so outer ≡ inner.
    grams = (
        docs.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("toks"))
        .filter(F.size("toks") >= NGRAM_N)
        .select("doc_id", F.array_distinct(grams_arr).alias("grams"))
        .select("doc_id", F.explode_outer("grams").alias("gram"))
        .select("doc_id", stable_token_hash("gram").alias("h"))
    )
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    corpus = grams.filter(~is_bench)
    bench = grams.filter(is_bench).select("h").distinct().withColumn("hit", F.lit(1))
    # ONE pass over the corpus grams: left-join the (broadcastable)
    # benchmark hash set as a hit marker, then a single groupBy(doc_id)
    # counts both totals — no second scan, no second shuffle.
    counts = (
        corpus.join(bench, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_shared"),
        )
    )
    frac = F.col("n_shared").cast("double") / F.col("n_ngrams")
    return counts.select(
        "doc_id",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_shared").cast("long").alias("n_shared"),
        frac.alias("overlap_frac"),
        (frac >= CONTAM_THRESHOLD).alias("contaminated"),
    )


@query(
    "q_repetition_stats",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
    ),
    cnt AS (
        SELECT doc_id, t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY doc_id, t
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) AS DOUBLE) / SUM(c) AS type_token_ratio,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac,
           CAST(MAX(c) AS DOUBLE) / SUM(c) > 0.2 AS repetitive
    FROM cnt GROUP BY doc_id
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/diversity quality signals (the Gopher-rules family):
    type-token ratio and most-frequent-token mass per document, with a
    drop flag for degenerate repetitive text — the filter that catches
    boilerplate and keyword-stuffed spam that length/stopword checks
    (q_quality_score) miss.

    Scale: two aggregations — (doc, token) counts then per-doc rollup —
    both keyed on doc_id(+token), uniform by construction; partial
    aggregation collapses repeated tokens map-side, so the heavy hitter
    that makes a doc repetitive never amplifies its shuffle size."""
    docs = load_table_spread(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_frac = F.max("c").cast("double") / F.sum("c")
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("type_token_ratio"),
        top_frac.alias("top_token_frac"),
        (top_frac > 0.2).alias("repetitive"),
    )


# Tokenizer-vocabulary construction: reserved ids for special tokens,
# a minimum-frequency floor for inclusion.
VOCAB_MIN_COUNT = 2
VOCAB_NUM_SPECIAL = 4  # <pad>, <unk>, <bos>, <eos>


@query(
    "q_vocab_ids",
    oracle=f"""
    WITH tf AS (
        SELECT t.t AS token, COUNT(*) AS n
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(t)
        WHERE t.t <> ''
        GROUP BY 1
    )
    SELECT token, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC)
                + {VOCAB_NUM_SPECIAL - 1} AS BIGINT) AS token_id
    FROM tf WHERE n >= {VOCAB_MIN_COUNT}
    """,
)
def q_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary construction: frequency-ranked
    token → id assignment (ids {VOCAB_NUM_SPECIAL}+; 0..{VOCAB_NUM_SPECIAL - 1}
    reserved for <pad>/<unk>/<bos>/<eos>), with a min-frequency floor —
    the deterministic id table every corpus→token-id encode pass joins
    against.

    Scale: the corpus-sized work is the token count, whose Zipfian
    skew collapses in map-side partials; the global rank window then
    runs over the DISTINCT-TOKEN relation, which is bounded by
    morphology (~1e6-1e7 rows regardless of corpus bytes), so the
    single-partition window sort is a non-issue — ranking cost scales
    with vocabulary, not with the 100 TB input. Ties rank
    deterministically by (count desc, token asc) on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tf = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= VOCAB_MIN_COUNT)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return tf.select(
        "token",
        "n",
        (F.row_number().over(w) + (VOCAB_NUM_SPECIAL - 1)).cast("long").alias("token_id"),
    )


@query(
    "q_encode_tokens",
    oracle=f"""
    WITH tf AS (
        SELECT t.t AS token, COUNT(*) AS n
        FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(t)
        WHERE t.t <> ''
        GROUP BY 1
    ),
    vocab AS (
        SELECT token,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC)
                    + {VOCAB_NUM_SPECIAL - 1} AS BIGINT) AS token_id
        FROM tf WHERE n >= {VOCAB_MIN_COUNT}
    ),
    toks AS (
        SELECT d.doc_id, u.i - 1 AS pos, d.tk[u.i] AS token
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk
              FROM documents) d,
             UNNEST(generate_series(1, CAST(len(d.tk) AS BIGINT))) AS u(i)
    ),
    enc AS (
        SELECT t.doc_id, t.pos, COALESCE(v.token_id, 1) AS tid
        FROM toks t LEFT JOIN vocab v ON v.token = t.token
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN tid = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           CAST(SUM(CAST(CAST('0x' || substring(md5(
                   CAST(pos AS VARCHAR) || ':' || CAST(tid AS VARCHAR)
               ), 1, 15) AS BIGINT) AS DECIMAL(38,0))) % {2**60} AS BIGINT)
               AS ids_fp
    FROM enc GROUP BY doc_id
    """,
)
def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus→token-id encode pass: every document's tokens joined
    against the frequency-ranked vocabulary (q_vocab_ids), OOV mapping
    to ``<unk>``=1 — surfaced as a per-doc (length, unk count, 60-bit
    sequence fingerprint) row. The fingerprint is the SUM of a
    position-keyed 60-bit hash, md5("pos:tid"), mod 2^60 over exact
    decimal accumulation: each position appears exactly once, so the
    sum determines the pos→id map — it proves the exact encoded
    sequence like the old md5-of-joined-ids did, but as a PLAIN
    aggregate with map-side partials instead of a per-doc ordered list
    build. (Round 7: the list(tid ORDER BY pos) form made the DuckDB
    oracle allocate per-group ordered state for 500 K groups × 27.5 M
    rows under a memory cap — >65 K memory mappings, the kernel's
    vm.max_map_count, wedging the whole gate process at sf10. The
    commutative-hash-sum form is also the better Spark shape: no
    collect_list state, pure partial→final aggregation.)

    Scale: the vocab is morphology-bounded and joins as a broadcast
    (the one corpus-sized structure — exploded (doc, pos, token) rows —
    is immediately narrowed to 24-byte (doc, pos, id) rows); the
    fingerprint aggregate carries 16-byte decimal partials. This is the
    canonical encode shape: one explode, one broadcast join, one keyed
    shuffle."""
    docs = load_table_spread(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= VOCAB_MIN_COUNT)
    )
    from pyspark.sql import Window

    from flink_wikipedia_spark.functions.compat import stable_token_hash

    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    vocab = tf.select(
        "token",
        (F.row_number().over(w) + (VOCAB_NUM_SPECIAL - 1)).cast("long").alias("token_id"),
    )
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token")
    )
    enc = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.coalesce("token_id", F.lit(1)).alias("tid"),
    )
    pos_hash = stable_token_hash(
        F.concat(
            F.col("pos").cast("string"), F.lit(":"), F.col("tid").cast("string")
        )
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == 1, 1).otherwise(0)).cast("long").alias("n_unk"),
        (F.sum(pos_hash.cast("decimal(38,0)")) % F.lit(2**60))
        .cast("long")
        .alias("ids_fp"),
    )


@query(
    "q_repetition_signals",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n,
               {SQL_BIGRAMS} AS bg
        FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           {SQL_DUP_TOKEN_FRAC} AS dup_token_frac,
           {SQL_TOP_BIGRAM_FRAC} AS top_2gram_frac,
           CAST({sql_repetition_ok_duckdb()} AS INT) AS keep
    FROM b
    """,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star (quality filtering, Gopher-style repetition signals):
    per-document duplicate-token fraction and most-common-bigram
    fraction — the repetition filters production corpus pipelines run
    before training (boilerplate, keyword-stuffed, and template pages
    score high on exactly these).

    Entirely in-row via higher-order array functions: tokens →
    zip_with bigrams → per-row mode count — a MAP-ONLY single scan, no
    explode, no shuffle, no join-back. That is the right 100 TB shape
    for bounded-length documents (chunk upstream via q_doc_chunks for
    pathological lengths; the per-row mode count is quadratic in
    DISTINCT bigrams, fine at chunk scale). All counts are integers and
    each fraction is one IEEE double division of exact integers, so
    both engines produce bit-identical values — full oracle.
    """
    docs = load_table_spread(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.split(F.lower("text"), " ").alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n"),
        F.expr(BIGRAMS_EXPR).alias("bg"),
    )
    return staged.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        dup_token_frac_expr().alias("dup_token_frac"),
        top_bigram_frac_expr().alias("top_2gram_frac"),
        repetition_ok_expr().cast("int").alias("keep"),
    )


GOPHER_STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "that"]


@query(
    "q_gopher_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks,
               length(text) - length(replace(text, '#', '')) AS n_hash,
               (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks) AS n_words,
               CASE WHEN len(toks) = 0 THEN NULL ELSE
                   CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
                       / len(toks) END AS mean_word_len,
               CASE WHEN len(toks) = 0 THEN NULL ELSE
                   CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                       / len(toks) END AS alpha_word_ratio,
               CASE WHEN len(toks) = 0 THEN NULL ELSE
                   CAST(n_hash + n_ellipsis AS DOUBLE) / len(toks) END
                   AS symbol_word_ratio,
               len(list_intersect(list_distinct(toks),
                   {GOPHER_STOPWORDS!r})) AS n_stopwords_present
        FROM t
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
           alpha_word_ratio, symbol_word_ratio,
           CAST(n_stopwords_present AS BIGINT) AS n_stopwords_present,
           CAST(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3.0 AND 10.0
                AND alpha_word_ratio >= 0.8
                AND symbol_word_ratio <= 0.1
                AND n_stopwords_present >= 2 AS INT) AS keep
    FROM m
    """,
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality rules (Rae et al. 2021 — the
    public MassiveText filter set), the sibling of q_quality_score's
    cheap-pass filters: word-count bounds, mean word length bounds,
    alphabetic-word ratio, symbol-to-word ratio (# and ellipsis), and
    distinct-stopword presence, with the composite keep flag.

    Scale: one scan, zero exchanges — every metric is a row-local
    array fold (split → filter → aggregate/size), the same
    whole-stage-codegen shape as the other text folds; ratios are
    single IEEE double divisions of exact integers so both engines
    produce bit-identical values — full oracle."""
    docs = load_table_spread(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), " "), lambda w: w != F.lit("")
        ).alias("toks"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "#", ""))
        ).alias("n_hash"),
        (
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"\.\.\.", ""))
            )
            / F.lit(3)
        ).cast("long").alias("n_ellipsis"),
    ).select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_words"),
        "n_hash",
        "n_ellipsis",
    )
    n = F.col("n_words")
    guard = lambda e: F.when(n == 0, F.lit(None)).otherwise(e)  # noqa: E731
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    metrics = staged.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        guard(
            F.aggregate(
                "toks", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ).cast("double")
            / n
        ).alias("mean_word_len"),
        guard(
            F.size(F.filter("toks", lambda w: w.rlike("[a-z]"))).cast("double")
            / n
        ).alias("alpha_word_ratio"),
        guard(
            (F.col("n_hash") + F.col("n_ellipsis")).cast("double") / n
        ).alias("symbol_word_ratio"),
        F.size(
            F.array_intersect(F.array_distinct("toks"), stop_arr)
        ).cast("long").alias("n_stopwords_present"),
    )
    return metrics.select(
        "*",
        (
            n.between(50, 100_000)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("alpha_word_ratio") >= 0.8)
            & (F.col("symbol_word_ratio") <= 0.1)
            & (F.col("n_stopwords_present") >= 2)
        ).cast("int").alias("keep"),
    )


@query(
    "q_quality_classifier",
    oracle=f"""
    WITH t AS (
        -- coalesce(text,''): null text scores like empty text on BOTH
        -- sides (ADVICE r12 — engine/oracle null parity by construction)
        SELECT doc_id,
               list_filter(string_split(lower(coalesce(text, '')), ' '),
                           w -> w <> '')
                   AS toks
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               CAST(coalesce(list_sum(list_transform(toks,
                   t -> {SQL_CLF_WEIGHT})), 0) AS BIGINT) AS score_sum
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           score_sum,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE CAST(score_sum AS DOUBLE) / n_tokens END AS score_mean,
           CAST(score_sum > 0 AS INT) AS keep
    FROM m
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: a hashed bag-of-words LINEAR
    classifier (the fastText/CCNet-style scorer real pipelines run
    after the heuristic gates) — tokens feature-hash into 2^20 buckets,
    each bucket carries an integer micro-unit weight, the document
    score is the exact integer weight sum, keep = score > 0. Weights
    here are derived from the bucket id by a Knuth-LCG mix (a
    deterministic stand-in that keeps the FULL value oracle — exact
    int64 ops plus one IEEE division); a learned table drops in via
    operators/text.classifier_score_with_table (broadcast join), which
    tests pin value-equal to this fold.

    Scale: one scan, zero exchanges — split → hash → weight → integer
    fold, all whole-stage codegen. The learned-table variant broadcasts
    the model (2^20 buckets ≈ 12 MB — model-sized, corpus-independent)
    and shuffles only (doc_id, weight) longs for its groupBy."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return docs.select("doc_id", *classifier_score_cols("text"))


@query(
    "q_lm_perplexity",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(coalesce(text, '')), ' '),
                           w -> w <> '') AS toks
        FROM documents
    ), bg AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i+1])
               ELSE [] END AS grams
        FROM t
    ), m AS (
        SELECT doc_id,
               len(grams) AS n_bigrams,
               CAST(coalesce(list_sum(list_transform(grams,
                   g -> {SQL_LM_LOGPROB})), 0) AS BIGINT) AS logprob_sum
        FROM bg
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           logprob_sum,
           CASE WHEN n_bigrams = 0 THEN NULL
                ELSE CAST(logprob_sum AS DOUBLE) / (n_bigrams * 1000000)
           END AS logprob_mean,
           CASE WHEN n_bigrams = 0 THEN NULL
                WHEN logprob_sum >= {LM_HEAD_MEAN_MICRO} * n_bigrams
                    THEN 'head'
                WHEN logprob_sum >= {LM_KEEP_MEAN_MICRO} * n_bigrams
                    THEN 'middle'
                ELSE 'tail' END AS ppl_bucket,
           CAST(n_bigrams > 0
                AND logprob_sum >= {LM_KEEP_MEAN_MICRO} * n_bigrams
                AS INT) AS keep
    FROM m
    """,
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram LM perplexity filter — the THIRD gate of the quality
    triad (CCNet shape, Wenzek et al. 2020: score each document with a
    KenLM n-gram model, bucket the corpus head/middle/tail by
    perplexity; KenLM — Heafield 2011). The LM here is a hashed-bigram
    log-probability table (operators/text.lm_perplexity_cols): bigrams
    feature-hash into 2^20 buckets whose integer micro-log10-prob is
    derived by the same Knuth-LCG mix as q_quality_classifier — a
    deterministic stand-in for a trained table with a FULL value
    oracle. logprob_mean is the mean log10 prob per bigram
    (ppl = 10^-mean, reported in log space so no cross-engine pow);
    head/middle/tail and keep compare exact integers
    (logprob_sum ≥ threshold·n), so every column hash-matches.

    Scale: one scan, ZERO exchanges — split → bigram zip → hash →
    log-prob → integer fold, all row-local array expressions (same
    plan family as q_gopher_quality / q_quality_classifier). A learned
    table drops in as a ~12 MB broadcast exactly like
    classifier_score_with_table."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return lm_perplexity_frame(docs.select("doc_id", "text"))


@query(
    "q_quality_triad_funnel",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               -- coalesce BOTH heuristic inputs (ADVICE r13): null text
               -- must fail the heuristic stage here exactly as on the
               -- Spark side (quality_score_cols keep=0), not slip to
               -- 'classifier' via a NULL h_ok skipping the CASE arm
               string_split(lower(coalesce(text, '')), ' ') AS rawtoks,
               coalesce(length(text), 0) AS ln,
               list_filter(string_split(lower(coalesce(text, '')), ' '),
                           w -> w <> '') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, lang, ln,
               len(rawtoks) AS n,
               CAST(coalesce(list_sum(list_transform(toks,
                   t -> {SQL_CLF_WEIGHT})), 0) AS BIGINT) AS clf_sum,
               CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i+1])
               ELSE [] END AS grams
        FROM t
    ), f AS (
        SELECT lang,
               (n >= 20 AND (CAST(ln - (n - 1) AS DOUBLE) / n)
                    BETWEEN 2.0 AND 12.0) AS h_ok,
               clf_sum > 0 AS c_ok,
               (len(grams) > 0
                AND CAST(coalesce(list_sum(list_transform(grams,
                        g -> {SQL_LM_LOGPROB})), 0) AS BIGINT)
                    >= {LM_KEEP_MEAN_MICRO} * len(grams)) AS lm_ok
        FROM g
    )
    SELECT lang,
           CASE WHEN NOT h_ok THEN 'quality'
                WHEN NOT c_ok THEN 'classifier'
                WHEN NOT lm_ok THEN 'lm_perplexity'
                ELSE 'kept' END AS stage,
           COUNT(*) AS n_docs
    FROM f
    GROUP BY 1, 2
    """,
)
def q_quality_triad_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality TRIAD as an attribution funnel — the per-stage loss
    report for the three-gate pipeline real corpora run (heuristic
    rules → model classifier → LM perplexity, the CCNet/Gopher order:
    cheap gates first): each document attributed to its FIRST failing
    gate, counted per language. Gate definitions are the shared
    operators (quality_score_cols / classifier_score_cols /
    with_lm_keep), so this funnel, the standalone queries, and the
    streaming curation gates (build_curation_stream classifier_gate +
    lm_gate) can never disagree on a keep decision.

    Scale: one scan computes all three flags row-locally (zero
    exchanges until the final tiny groupBy(lang, stage) — ~langs×4
    output rows); stage order fixed so counts are additive:
    kept + losses = corpus.

    Null contract (ADVICE r13): null text is coalesced to '' BEFORE any
    gate, so it fails the FIRST (heuristic) stage on both engines — a
    raw null would make h_keep NULL, skip the 'quality' when-arm, and
    mis-attribute the doc to 'classifier' (the classifier and LM gates
    already coalesce internally, so their flags are unaffected)."""
    docs = load_table_spread(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    staged = docs.select(
        "lang",
        quality_score_cols("text")[3].alias("h_keep"),
        classifier_score_cols("text")[3].alias("c_keep"),
        "text",
    )
    gated = with_lm_keep(staged)
    stage = (
        F.when(F.col("h_keep") == 0, F.lit("quality"))
        .when(F.col("c_keep") == 0, F.lit("classifier"))
        .when(F.col("lm_keep") == 0, F.lit("lm_perplexity"))
        .otherwise(F.lit("kept"))
    )
    return gated.groupBy("lang", stage.alias("stage")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "q_c4_quality",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, chr(10)) AS lines,
               length(text) - length(translate(text, '.!?', '')) AS n_sentences,
               contains(lower(text), 'lorem ipsum') AS has_lorem,
               contains(text, '{') AS has_brace
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(lines) AS n_lines,
               CAST(list_sum(list_transform(lines,
                   l -> len(list_filter(string_split(l, ' '), w -> w <> ''))))
                   AS BIGINT) AS n_words,
               list_max(list_transform(lines,
                   l -> len(list_filter(string_split(l, ' '), w -> w <> ''))))
                   AS max_line_words,
               n_sentences,
               len(list_filter(lines,
                   l -> len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
                        AND right(l, 1) IN ('.', '!', '?', '"')
                        AND NOT contains(lower(l), 'javascript')))
                   AS n_kept_lines,
               1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
                   AS dup_line_frac,
               has_lorem, has_brace
        FROM t
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           n_words,
           CAST(max_line_words AS BIGINT) AS max_line_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_kept_lines AS BIGINT) AS n_kept_lines,
           dup_line_frac,
           CAST(has_lorem AS INT) AS has_lorem_ipsum,
           CAST(has_brace AS INT) AS has_brace,
           CAST(n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
                AND n_kept_lines >= 1 AS INT) AS keep
    FROM m
    """,
)
def q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style document-quality rules (Raffel et al. 2020 §2.2 — the
    public C4/RefinedWeb line-heuristic family), the line-level sibling
    of q_gopher_quality's word-level rules: terminal-punctuation line
    filter, min-words-per-line (≥5), per-line 'javascript' screen,
    page-level 'lorem ipsum' and curly-brace screens, a minimum
    sentence count (≥3, sentences counted as terminal-punctuation
    marks), and a line-level exact-dup fraction as the dedup signal.
    The composite keep flag is the C4 page rule: enough sentences, no
    lorem-ipsum/brace boilerplate, and at least one retained line.

    Scale: one scan, zero exchanges — every metric is a row-local
    array fold over the newline-split lines (split → filter →
    size/aggregate), the same whole-stage-codegen shape as
    q_gopher_quality; counts are exact integers and dup_line_frac is
    one IEEE double division, so both engines are bit-identical —
    full oracle. On corpora without line structure the flags are
    honest constants (1 line, 0 sentences) while n_words /
    max_line_words still exercise the split machinery."""
    docs = load_table_spread(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.split("text", "\n").alias("lines"),
        (
            F.length("text") - F.length(F.translate("text", ".!?", ""))
        ).cast("long").alias("n_sentences"),
        F.lower("text").contains("lorem ipsum").alias("has_lorem"),
        F.col("text").contains("{").alias("has_brace"),
    )
    lwords = lambda l: F.size(  # noqa: E731 — words on a line, '' dropped
        F.filter(F.split(l, " "), lambda w: w != F.lit(""))
    )
    kept_line = lambda l: (  # noqa: E731 — the C4 line-retention rule
        (lwords(l) >= 5)
        & F.substring(l, -1, 1).isin(".", "!", "?", '"')
        & ~F.lower(l).contains("javascript")
    )
    metrics = staged.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.aggregate(
            F.transform("lines", lwords),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n_words"),
        F.array_max(F.transform("lines", lwords)).cast("long")
        .alias("max_line_words"),
        "n_sentences",
        F.size(F.filter("lines", kept_line)).cast("long")
        .alias("n_kept_lines"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("lines")).cast("double")
            / F.size("lines")
        ).alias("dup_line_frac"),
        F.col("has_lorem").cast("int").alias("has_lorem_ipsum"),
        F.col("has_brace").cast("int").alias("has_brace"),
        (
            (F.col("n_sentences") >= 3)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
            & (F.size(F.filter("lines", kept_line)) >= 1)
        ).cast("int").alias("keep"),
    )
    return metrics


def _bpe_oracle_sql(k: int) -> str:
    """Unrolled DuckDB twin of bpe_learn_merges: the k-round
    count→argmax→replace iteration as k mechanical CTE stages (the
    k-means oracle used a recursive CTE because its state is one row
    per group; BPE's state is the whole segmented-vocabulary RELATION,
    which DuckDB's recursive CTEs can't aggregate over per round, so
    the fixed merge budget is unrolled instead — same exactness
    argument: integer pair counts, lexicographic tie-break, and the
    shared wrapped-string replace semantics)."""
    wl, wr = "chr(1)", "chr(2)"
    stages = [f"""
    w AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        ) WHERE word <> '' GROUP BY 1
    ), s0 AS (
        SELECT freq,
               array_to_string(list_transform(string_split(word, ''),
                   c -> {wl} || c || {wr}), '') AS seg
        FROM w
    )"""]
    for i in range(1, k + 1):
        stages.append(f"""
    p{i} AS (
        SELECT pr[1] AS lsym, pr[2] AS rsym,
               CAST(SUM(freq) AS BIGINT) AS n
        FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(syms)),
                          j -> [syms[j], syms[j+1]])) AS pr
            FROM (SELECT freq,
                         string_split(trim(seg, {wl} || {wr}),
                                      {wr} || {wl}) AS syms
                  FROM s{i-1})
        ) GROUP BY 1, 2
    ), m{i} AS (
        SELECT lsym, rsym, n FROM p{i}
        ORDER BY n DESC, lsym ASC, rsym ASC LIMIT 1
    ), s{i} AS (
        SELECT s.freq,
               replace(s.seg,
                       {wl} || m.lsym || {wr} || {wl} || m.rsym || {wr},
                       {wl} || m.lsym || m.rsym || {wr}) AS seg
        FROM s{i-1} s, m{i} m
    )""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, lsym, rsym, "
        f"lsym || rsym AS merged, n AS pair_count FROM m{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",".join(stages) + "\n    " + finals


def _bpe_derivation_stages(k: int) -> str:
    """The unrolled merge-derivation CTEs (w, s0, p/m/s 1..k) shared by
    every BPE oracle: cut the q_bpe_merges oracle at its final SELECT,
    keeping only the CTE block, so rules/encode/vocab/ids all derive
    from ONE definition of the iteration."""
    derive = _bpe_oracle_sql(k)
    cut = derive.index("\n    SELECT CAST(1 AS BIGINT) AS merge_rank")
    return derive[len("WITH "):cut].rstrip()


def _bpe_docseg_chain(k: int) -> tuple[str, str]:
    """(chain, froms) for the per-document segmentation: the k learned
    merges replayed over each document's word-wise wrapped
    segmentation as a nested replace chain. The m{i} CTEs are single
    rows, so the k-way cross join is a scalar broadcast, not a
    blow-up."""
    wl, wr = "chr(1)", "chr(2)"
    # outer coalesce: DuckDB's array_to_string([]) is NULL where
    # Spark's array_join([]) is '' — a wordless doc must segment to ''
    chain = f"""coalesce(array_to_string(list_transform(
                 list_filter(string_split(lower(coalesce(text, '')), ' '),
                             t -> t <> ''),
                 w -> array_to_string(list_transform(string_split(w, ''),
                          c -> {wl} || c || {wr}), '')), ' '), '')"""
    for i in range(1, k + 1):
        chain = (
            f"replace({chain}, {wl} || m{i}.lsym || {wr} || {wl} || "
            f"m{i}.rsym || {wr}, {wl} || m{i}.lsym || m{i}.rsym || {wr})"
        )
    froms = ", ".join(f"m{i}" for i in range(1, k + 1))
    return chain, froms


def _bpe_encode_oracle_sql(k: int) -> str:
    """DuckDB twin of q_bpe_encode: re-derives the k merge rules with
    the SAME unrolled stages as q_bpe_merges' oracle (so learn and
    apply can never disagree), then replays them over each document's
    word-wise wrapped segmentation as a nested replace chain (see
    _bpe_docseg_chain).

    The ``FROM documents, m1, …, mk`` cross join PRESUMES every m{i}
    is exactly one row: on a corpus that exhausts pair types before k
    merges, an empty m{i} would make this oracle silently return ZERO
    rows while the Spark side raises ValueError (ADVICE r14). That
    asymmetry never reaches a gate compare because the Spark builder
    runs bpe_learn_merges FIRST and fails loudly before the oracle is
    consulted — but anyone reusing this SQL standalone should check
    the corpus supports k merges."""
    wl, wr = "chr(1)", "chr(2)"
    stages = _bpe_derivation_stages(k)
    chain, froms = _bpe_docseg_chain(k)
    return f"""WITH {stages},
    docseg AS (
        SELECT doc_id, {chain} AS seg
        FROM documents, {froms}
    )
    SELECT doc_id,
           CAST(CASE WHEN length(seg) = 0 THEN 0
                ELSE length(seg) - length(replace(seg, ' ', '')) + 1
                END AS BIGINT) AS n_words,
           CAST(length(seg) - length(replace(seg, {wl}, ''))
                AS BIGINT) AS n_subwords,
           md5(seg) AS seg_fp
    FROM docseg
    """


@query(
    "q_bpe_merges",
    oracle=_bpe_oracle_sql(BPE_NUM_MERGES),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING — the vocabulary-learning step of an LLM
    data pipeline (Sennrich et al. 2016), upstream of q_vocab_ids'
    frequency-ranked ids and q_encode_tokens' encode pass: the first
    BPE_NUM_MERGES learned merge rules (rank, pair, merged symbol,
    exact pair count) from character-level segmentations of the
    corpus's words.

    The third conquest of the iterative-algorithm family (PageRank
    r12, k-means r13): bounded rounds, exact int64 pair counts,
    deterministic lexicographic tie-break, and ONE shared greedy-merge
    semantics — segmentations live as wrapped strings so each round's
    merge is a non-regex replace() that scans left-to-right
    non-overlapping identically on Spark, DuckDB, and Python (see
    operators/text.py BPE block).

    Scale: the only corpus-sized work is the word count (map-side
    partials absorb the Zipfian head); the merge loop runs over the
    DISTINCT-WORD relation, bounded by morphology (~1e6-1e7 rows at
    any corpus size) — vocabularies under BPE_SMALL_VOCAB_WORDS train
    in one exact driver pass (pagerank's guarded small-side shape),
    larger ones take the distributed per-round job loop, pinned
    bit-identical in tests/test_bpe_merges.py by forcing the guard to
    0. Reference has no tokenizer training (north-star E3 extension;
    cf. DataStreamJob.java:68-83's fixed map-only pipeline)."""
    docs = load_table_spread(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return bpe_learn_merges(words, BPE_NUM_MERGES)


@query(
    "q_bpe_encode",
    oracle=_bpe_encode_oracle_sql(BPE_NUM_MERGES),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY — the encode half of the learn→apply tokenizer
    pipeline: learn the corpus's BPE_NUM_MERGES merge rules
    (q_bpe_merges' operator, same derivation), then replay them over
    every document to produce its subword segmentation, surfaced as
    (n_words, n_subwords, seg_fp) where seg_fp is the md5 of the exact
    final segmentation string — the oracle compare proves the full
    per-document token SEQUENCE, not just counts (the q_encode_tokens
    fingerprint discipline).

    Null contract: text coalesces to '' before segmentation on both
    engines (the funnel rule), so null docs encode as 0 words /
    0 subwords.

    Scale: learning runs over the morphology-bounded word relation
    (see q_bpe_merges); the learned rules return to the driver as K
    plan LITERALS, so the corpus-sized encode pass is ONE map-only
    scan — a K-deep replace chain per document in whole-stage codegen,
    no join against a rules table, no shuffle anywhere. The oracle
    re-derives the rules in-SQL (single-row m{i} CTEs cross-joined as
    scalars) so learn and apply can never disagree."""
    from flink_wikipedia_spark.operators.text import (
        bpe_apply_merges_expr,
        bpe_encode_cols,
        bpe_train,
    )

    docs = load_table_spread(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # bpe_train hands back the rule list directly — no DataFrame
    # round-trip + collect for rules that only exist as plan literals
    merges, _ = bpe_train(words, BPE_NUM_MERGES)
    seg = bpe_apply_merges_expr("text", merges)
    return docs.select("doc_id", *bpe_encode_cols(seg))


def _bpe_vocab_oracle_sql(k: int) -> str:
    """DuckDB twin of q_bpe_vocab: the same unrolled derivation, final
    SELECT unnests s{k}'s segmented words and sums word frequencies per
    surviving symbol."""
    wl, wr = "chr(1)", "chr(2)"
    stages = _bpe_derivation_stages(k)
    return f"""WITH {stages}
    SELECT sym AS symbol, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM (
        SELECT freq,
               unnest(string_split(trim(seg, {wl} || {wr}),
                                   {wr} || {wl})) AS sym
        FROM s{k}
    ) GROUP BY 1
    """


@query(
    "q_bpe_vocab",
    oracle=_bpe_vocab_oracle_sql(BPE_NUM_MERGES),
)
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FINAL VOCABULARY after BPE training: every symbol surviving
    the K learned merges (single characters plus the merged subwords),
    with its exact corpus occurrence count (word frequency × in-word
    count) — the table a tokenizer ships alongside its merge list, and
    the direct input to q_vocab_ids-style id assignment over SUBWORDS
    instead of whole words.

    Scale: same posture as q_bpe_merges — learning on the
    morphology-bounded word relation; the vocab aggregation is one
    explode + groupBy over that same bounded relation (symbols per
    word ≤ word length), never the corpus. Oracle reuses the unrolled
    derivation stages, so rules, encode, and vocab all derive from ONE
    definition of the iteration."""
    from flink_wikipedia_spark.functions.compat import arrow_local_df
    from flink_wikipedia_spark.operators.text import (
        BPE_WRAP_L,
        BPE_WRAP_R,
        bpe_train,
        bpe_vocab_from_segs,
        bpe_wrap_word_expr,
    )

    docs = load_table_spread(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges, segs = bpe_train(words, BPE_NUM_MERGES)
    if segs is not None:
        # small-vocab driver path: the trainer already holds every
        # distinct word's FINAL segmentation, so the vocabulary is a
        # pure integer fold over it — zero additional jobs where the
        # old form re-ran the corpus word count a second time plus a
        # distributed explode+groupBy (same values: bit-identical
        # replace semantics, exact int64 sums; pinned in
        # tests/test_bpe_merges.py against the distributed derivation)
        return arrow_local_df(
            spark,
            bpe_vocab_from_segs(segs),
            "symbol string, n_occurrences long",
            ["symbol", "n_occurrences"],
        )
    seg = bpe_wrap_word_expr("word")
    for _, a, b, _, _ in sorted(merges, key=lambda m: m[0]):
        seg = F.replace(
            seg,
            F.lit(BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R),
            F.lit(BPE_WRAP_L + a + b + BPE_WRAP_R),
        )
    syms = F.split(F.btrim(seg, F.lit(BPE_WRAP_L + BPE_WRAP_R)),
                   BPE_WRAP_R + BPE_WRAP_L)
    return (
        words.select("freq", F.explode(syms).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
    )


def _bpe_ids_oracle_sql(k: int) -> str:
    """DuckDB twin of q_bpe_ids: the shared unrolled derivation, then
    (a) the final vocabulary ranked to token ids exactly like
    q_vocab_ids (ROW_NUMBER over count desc, symbol asc, offset past
    the reserved special ids) and (b) every document's segmentation
    flattened to its ordered symbol list and mapped through a
    one-row symbol→id MAP — no per-group ordered aggregation anywhere
    (the r7 sf10 lesson), so the encode stays row-local.

    The outer coalesce on the CSV mirrors Spark: DuckDB's
    array_to_string([]) is NULL where Spark's array_join([]) is '',
    and an empty document must fingerprint as md5('')."""
    wl, wr = "chr(1)", "chr(2)"
    stages = _bpe_derivation_stages(k)
    chain, froms = _bpe_docseg_chain(k)
    return f"""WITH {stages},
    vocab AS (
        SELECT sym AS symbol, CAST(SUM(freq) AS BIGINT) AS n
        FROM (
            SELECT freq,
                   unnest(string_split(trim(seg, {wl} || {wr}),
                                       {wr} || {wl})) AS sym
            FROM s{k}
        ) GROUP BY 1
    ),
    ids AS (
        SELECT symbol,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, symbol ASC)
                    + {VOCAB_NUM_SPECIAL - 1} AS BIGINT) AS token_id
        FROM vocab
    ),
    idmap AS (
        SELECT map(list(symbol ORDER BY symbol),
                   list(token_id ORDER BY symbol)) AS mm
        FROM ids
    ),
    docseg AS (
        SELECT doc_id, {chain} AS seg
        FROM documents, {froms}
    ),
    docids AS (
        SELECT doc_id,
               list_transform(
                   list_filter(
                       flatten(list_transform(string_split(seg, ' '),
                           w -> string_split(trim(w, {wl} || {wr}),
                                             {wr} || {wl}))),
                       s -> s <> ''),
                   s -> mm[s][1]) AS ids
        FROM docseg, idmap
    )
    SELECT doc_id,
           CAST(len(ids) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(ids)) AS BIGINT) AS n_distinct_ids,
           md5(coalesce(array_to_string(
               list_transform(ids, i -> CAST(i AS VARCHAR)), ','), ''))
               AS ids_fp
    FROM docids
    """


@query(
    "q_bpe_ids",
    oracle=_bpe_ids_oracle_sql(BPE_NUM_MERGES),
)
def q_bpe_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer loop CLOSED: documents become subword TOKEN-ID
    SEQUENCES — the artifact an LLM data pipeline actually ships.
    Learn the corpus's merge rules (q_bpe_merges' operator), assign
    deterministic ids over the final vocabulary (q_bpe_vocab's symbol
    counts ranked by count desc, symbol asc — the q_vocab_ids
    discipline, ids starting at VOCAB_NUM_SPECIAL past the reserved
    <pad>/<unk>/<bos>/<eos> slots), then encode every document and
    surface (n_tokens, n_distinct_ids, ids_fp) where ids_fp is the md5
    of the comma-joined id sequence — the oracle compare proves the
    EXACT per-document id sequence end-to-end, so merges, vocabulary,
    id assignment, and encode cannot drift apart (all four derive from
    the one unrolled definition on the oracle side).

    There is no <unk> path: the vocabulary is learned from the same
    corpus being encoded, so every symbol is in-vocab by construction
    (OOV handling lives in q_encode_tokens' whole-word encode).

    Null contract: text coalesces to '' (the funnel rule) — a null doc
    encodes to 0 tokens with ids_fp = md5('').

    Scale: learning runs on the morphology-bounded word relation (see
    q_bpe_merges); both the merge rules and the symbol→id table return
    to the driver as PLAN LITERALS (the vocabulary is chars + K merged
    symbols — dozens of rows, model-sized like the merge list), so the
    corpus pass is ONE map-only whole-stage-codegen scan: a K-deep
    replace chain, an array map through a literal id map, one md5 — no
    rules-table join, no shuffle, no per-doc ordered aggregation state
    (the r7 sf10 lesson: fingerprints come from row-local strings, not
    collect_list). Reference has no tokenizer (north-star E3;
    cf. DataStreamJob.java:68-83's fixed map-only pipeline)."""
    from flink_wikipedia_spark.operators.text import (
        BPE_WRAP_L,
        BPE_WRAP_R,
        bpe_apply_merges_expr,
        bpe_train,
        bpe_vocab_from_segs,
        bpe_wrap_word_expr,
    )

    docs = load_table_spread(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges, segs = bpe_train(words, BPE_NUM_MERGES)

    # Final vocabulary with exact counts (the q_bpe_vocab derivation),
    # ranked to ids on the driver — the vocabulary is bounded by
    # alphabet + K merges, so this is a model-sized table like the
    # merge list itself. On the small-vocab driver path the trainer's
    # final segmentations yield it as a pure fold (bpe_vocab_from_segs,
    # already (count desc, symbol asc)-ranked) with zero extra jobs;
    # the distributed fallback re-derives it with the explode+groupBy
    # collect the small path used to pay too.
    if segs is not None:
        ranked = [sym for sym, _ in bpe_vocab_from_segs(segs)]
    else:
        vseg = bpe_wrap_word_expr("word")
        for _, a, b, _, _ in sorted(merges, key=lambda m: m[0]):
            vseg = F.replace(
                vseg,
                F.lit(BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R),
                F.lit(BPE_WRAP_L + a + b + BPE_WRAP_R),
            )
        vsyms = F.split(F.btrim(vseg, F.lit(BPE_WRAP_L + BPE_WRAP_R)),
                        BPE_WRAP_R + BPE_WRAP_L)
        ranked = [
            r.symbol
            for r in (
                words.select("freq", F.explode(vsyms).alias("symbol"))
                .groupBy("symbol")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("symbol").asc())
                .collect()
            )
        ]
    id_map = {
        symbol: VOCAB_NUM_SPECIAL + rank
        for rank, symbol in enumerate(ranked)
    }
    map_lit = F.create_map(
        *[x for s in sorted(id_map) for x in (F.lit(s), F.lit(id_map[s]))]
    )

    seg = bpe_apply_merges_expr("text", merges)
    syms = F.filter(
        F.flatten(
            F.transform(
                F.split(seg, " "),
                lambda w: F.split(
                    F.btrim(w, F.lit(BPE_WRAP_L + BPE_WRAP_R)),
                    BPE_WRAP_R + BPE_WRAP_L,
                ),
            )
        ),
        lambda s: s != "",
    )
    staged = docs.select(
        "doc_id",
        F.transform(syms, lambda s: F.element_at(map_lit, s)).alias("ids"),
    )
    return staged.select(
        "doc_id",
        F.size("ids").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("ids")).cast("long").alias("n_distinct_ids"),
        F.md5(
            F.array_join(
                F.transform("ids", lambda i: i.cast("string")), ","
            )
        ).alias("ids_fp"),
    )
