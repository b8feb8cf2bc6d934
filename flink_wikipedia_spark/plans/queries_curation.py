"""Corpus-curation queries: the pipeline steps between "filtered corpus"
and "training batches" — deterministic stratified sampling (mixture
rebalancing) and token-budget sequence packing (context-window planning).

Both are pure built-in expressions with full DuckDB oracles; both are
designed around the 100 TB constraint that per-language partitions are
Zipfian (en dominates), so nothing here shuffles the corpus by the raw
low-cardinality ``lang`` key alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import (
    arrow_local_df,
    stable_token_hash,
)
from flink_wikipedia_spark.operators.text import (
    BIGRAMS_EXPR,
    SQL_BIGRAMS,
    repetition_ok_expr,
    sql_repetition_ok_duckdb,
)
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table, load_table_spread

# Token budget of one packed training sequence, and the shard fan-out
# that keeps packing parallel (at 100 TB this is thousands, not 8).
PACK_BUDGET = 2048
PACK_SHARDS = 8

# Per-language keep rates in basis points (of 10_000): the classic
# mixture rebalance — downsample the dominant language, keep the rest.
SAMPLE_RATES_BP = {"en": 2500, "de": 7500, "es": 7500, "fr": 7500, "zh": 7500}
_RATE_ROWS = ", ".join(f"('{lg}', {bp})" for lg, bp in sorted(SAMPLE_RATES_BP.items()))

# Provenance blocklist (C4-style domain filtering): sources whose
# documents never enter the training mix. At 100 TB this is a table of
# millions of domains — still a few-MB broadcast, never a shuffle key.
BLOCKED_SOURCES = ["src3", "src7", "src13"]
_BLOCKED_IN = ", ".join(f"'{s}'" for s in BLOCKED_SOURCES)

# PII redaction patterns — kept to the regex subset where Java regex
# (Spark) and RE2 (DuckDB) agree: no backrefs, no lookaround.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Training-shard fan-out for the deterministic global shuffle.
SHUFFLE_SHARDS = 16


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, shard, n_tokens,
           CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS stream_offset,
           CAST((SUM(n_tokens) OVER w - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin
    FROM t
    WINDOW w AS (PARTITION BY lang, shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan: assign every document a position in a
    concatenated per-(lang, shard) token stream and the {PACK_BUDGET}-token
    training bin its first token lands in — the concat-and-chop packing
    an LLM data loader runs, expressed as ONE running-sum window.

    Scale: packing needs a total order, which naively means a global
    sort — instead the stream is sharded by ``doc_id % {PACK_SHARDS}``
    WITHIN each language, so the window partitions by (lang, shard):
    parallelism scales with the shard count and no partition inherits
    all of English. Deterministic: integer running sums over the
    doc_id order."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("stream_offset")
    return t.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        offset,
    ).withColumn("bin", F.expr(f"stream_offset div {PACK_BUDGET}"))


@query(
    "q_stratified_sample",
    oracle=f"""
    SELECT d.doc_id, d.lang, CAST(r.rate_bp AS BIGINT) AS rate_bp,
           CAST(CAST('0x' || substring(md5('s|' || d.doc_id), 1, 15) AS BIGINT)
                % 10000 AS BIGINT) AS draw_bp
    FROM documents d
    JOIN (VALUES {_RATE_ROWS}) AS r(lang, rate_bp) ON r.lang = d.lang
    WHERE CAST('0x' || substring(md5('s|' || d.doc_id), 1, 15) AS BIGINT)
          % 10000 < r.rate_bp
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for mixture rebalancing:
    per-language keep rates (downsample dominant English to 25%, keep
    75% elsewhere), decided by an md5-derived uniform draw on doc_id —
    reproducible across runs, engines, and partitionings, unlike
    ``df.sample`` (partition-seeded RNG, not stable under repartition).

    Scale: the draw is a per-row expression in codegen and the 5-entry
    mixture inlines as a literal CASE — zero joins, zero shuffles, the
    sample of a 100 TB corpus is a pure map-only scan (the
    createDataFrame-and-broadcast form paid a local-collection job +
    broadcast per run: 8× this plan's cost. A production rate table
    keyed on thousands of (lang, source) pairs goes back to a broadcast
    dim join — the inline literal is right up to ~hundreds of
    entries)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = None
    for lg, bp in sorted(SAMPLE_RATES_BP.items()):
        rate = (F.when if rate is None else rate.when)(F.col("lang") == lg, F.lit(bp))
    draw = (
        stable_token_hash(F.concat(F.lit("s|"), F.col("doc_id").cast("string")))
        % 10000
    ).alias("draw_bp")
    return (
        docs.select("doc_id", "lang", rate.cast("long").alias("rate_bp"), draw)
        .filter(F.col("rate_bp").isNotNull() & (F.col("draw_bp") < F.col("rate_bp")))
    )


@query(
    "q_source_blocklist",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
               AS n_tokens_kept
    FROM documents
    WHERE source NOT IN ({_BLOCKED_IN})
    GROUP BY 1
    """,
)
def q_source_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance blocklist filtering (C4-style domain exclusion): drop
    every document from a blocked source, then report the surviving
    per-language doc and token counts — the admission-control step of a
    curation pipeline.

    Scale: the blocklist joins as a broadcast LEFT ANTI (a real
    blocklist is millions of domains — megabytes, not a dim worth a
    shuffle), the filter rides the scan, and the per-language rollup
    collapses map-side to |langs| rows. One pass, one tiny exchange."""
    docs = load_table(spark, sf_dir, "documents")
    blocked = arrow_local_df(
        spark, [(s,) for s in BLOCKED_SOURCES], "source string", ["source"]
    )
    return (
        docs.join(F.broadcast(blocked), "source", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
            .cast("long")
            .alias("n_tokens_kept"),
        )
    )


@query(
    "q_pii_redact",
    oracle=f"""
    WITH enriched AS (
        SELECT doc_id,
               'contact user' || doc_id || '@example' || (doc_id % 7)
                 || '.com from 10.' || (doc_id % 256) || '.0.'
                 || (doc_id % 100) || ' ' || text AS raw
        FROM documents
    ),
    pass1 AS (
        SELECT doc_id, raw,
               CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g') AS noemail
        FROM enriched
    )
    SELECT doc_id, n_emails,
           CAST(len(regexp_extract_all(noemail, '{IPV4_RE}')) AS BIGINT)
               AS n_ips,
           substring(regexp_replace(noemail, '{IPV4_RE}', '<IP>', 'g'), 1, 64)
               AS redacted_head
    FROM pass1
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact email addresses and IPv4 addresses and
    count what was removed — the privacy pass every public-web training
    corpus runs before tokenization. The synthetic corpus contains no
    PII, so a deterministic contact header derived from ``doc_id`` is
    prepended first; the redaction then operates on real non-trivial
    matches (the header) and real negative text (the document body).

    Patterns stay inside the Java-regex/RE2 common subset (no
    backrefs/lookaround) so Spark and the DuckDB oracle redact
    identically; emails are removed before the IP pass so an address
    like ``10.4.0.9`` inside ``user@10...`` can't double-count.

    Scale: pure per-row codegen expressions — map-only, zero shuffle;
    a 100 TB redaction pass is embarrassingly parallel and this plan
    keeps it that way (no UDF, no Python)."""
    docs = load_table_spread(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" "),
        F.col("text"),
    )
    noemail = F.regexp_replace(raw, EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(noemail, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.substring(F.regexp_replace(noemail, IPV4_RE, "<IP>"), 1, 64).alias(
            "redacted_head"
        ),
    )


@query(
    "q_shuffle_shards",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST('0x' || substring(md5('shuf|' || doc_id), 1, 15) AS BIGINT)
                   AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(h % {SHUFFLE_SHARDS} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % {SHUFFLE_SHARDS}
                                   ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM t
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: place every document at a
    reproducible (shard, position) using an md5-derived key — the
    "shuffle the corpus once, write N shard files" step before
    training. Unlike ``ORDER BY rand()`` the placement is stable across
    runs, engines, and input partitionings, so a resumed job rebuilds
    byte-identical shards.

    Scale: a true global sort of 100 TB is one giant range exchange;
    sharding first means ONE hash exchange on ``h % {SHUFFLE_SHARDS}``
    and an in-partition sort per shard (thousands of shards in
    production — each sort fits in an executor). The hash key is
    uniform, so shards balance regardless of corpus skew."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = stable_token_hash(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
    t = docs.select("doc_id", h.alias("h"))
    w = Window.partitionBy(F.col("h") % SHUFFLE_SHARDS).orderBy("h", "doc_id")
    return t.select(
        "doc_id",
        (F.col("h") % SHUFFLE_SHARDS).alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# Corpus-wide token budget for the water-filling mixture allocation:
# sits between |sources|×min(source tokens) and the corpus total at the
# correctness SFs, so both branches (saturated small sources, fair-capped
# large ones) are exercised and oracle-checked.
TOKEN_BUDGET = 25_000


@query(
    "q_token_budget_waterfill",
    oracle=f"""
    WITH agg AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, n_tokens,
               ROW_NUMBER() OVER ord AS rn,
               COUNT(*) OVER () AS k,
               COALESCE(SUM(n_tokens) OVER (
                   ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0
               ) AS prefix
        FROM agg
        WINDOW ord AS (ORDER BY n_tokens ASC, source ASC)
    ),
    s AS (
        SELECT *,
               n_tokens <= CAST({TOKEN_BUDGET} - prefix AS DOUBLE)
                           / (k - rn + 1) AS sat
        FROM w
    ),
    g AS (
        SELECT *,
               SUM(CASE WHEN sat THEN n_tokens ELSE 0 END) OVER () AS sat_sum,
               SUM(CASE WHEN sat THEN 0 ELSE 1 END) OVER () AS unsat_cnt
        FROM s
    )
    SELECT source, n_docs, n_tokens,
           CASE WHEN sat THEN CAST(n_tokens AS DOUBLE)
                ELSE CAST({TOKEN_BUDGET} - sat_sum AS DOUBLE) / unsat_cnt
           END AS alloc_tokens,
           CASE WHEN sat THEN CAST(1.0 AS DOUBLE)
                ELSE (CAST({TOKEN_BUDGET} - sat_sum AS DOUBLE) / unsat_cnt)
                     / n_tokens
           END AS sample_rate
    FROM g
    """,
)
def q_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North star (mixture planning): allocate a fixed training-token
    budget across sources by WATER-FILLING — every source below its
    fair share contributes everything it has (sample_rate 1.0), and the
    leftover splits equally among the larger sources, which are all
    capped at the same level c (the classic solution to
    "maximize the minimum source representation under a budget").

    Single-pass closed form instead of the iterative redistribution
    loop: order sources by size ascending; source i is saturated iff
    n_i <= (B - prefix_i) / remaining_slots_i (a prefix-sum window),
    and the cap is c = (B - Σ saturated) / |unsaturated|.

    Scale: one corpus-scale shuffle (groupBy source with map-side
    partial counts) reduces 100 TB to |sources| rows; the ordered
    windows after it run on that driver-tiny frame — a deliberate
    single-partition window over ~dozens of rows, not data."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    ord_w = Window.orderBy(F.col("n_tokens").asc(), F.col("source").asc())
    full_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = agg.select(
        "source",
        "n_docs",
        "n_tokens",
        F.row_number().over(ord_w).alias("rn"),
        F.count(F.lit(1)).over(full_w).alias("k"),
        F.coalesce(
            F.sum("n_tokens").over(
                ord_w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("prefix"),
    )
    sat = F.col("n_tokens") <= (
        (F.lit(TOKEN_BUDGET) - F.col("prefix")).cast("double")
        / (F.col("k") - F.col("rn") + 1)
    )
    g = w.select(
        "source",
        "n_docs",
        "n_tokens",
        sat.alias("sat"),
    ).select(
        "*",
        F.sum(F.when(F.col("sat"), F.col("n_tokens")).otherwise(0))
        .over(full_w)
        .alias("sat_sum"),
        F.sum(F.when(F.col("sat"), 0).otherwise(1)).over(full_w).alias("unsat_cnt"),
    )
    cap = (F.lit(TOKEN_BUDGET) - F.col("sat_sum")).cast("double") / F.col(
        "unsat_cnt"
    )
    return g.select(
        "source",
        "n_docs",
        "n_tokens",
        F.when(F.col("sat"), F.col("n_tokens").cast("double"))
        .otherwise(cap)
        .alias("alloc_tokens"),
        F.when(F.col("sat"), F.lit(1.0))
        .otherwise(cap / F.col("n_tokens"))
        .alias("sample_rate"),
    )


@query(
    "q_curation_funnel",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, source, text,
               string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n,
               {SQL_BIGRAMS} AS bg
        FROM documents
    ),
    flags AS (
        SELECT doc_id, lang, source,
               source IN ({_BLOCKED_IN}) AS blocked,
               (n >= 20 AND (CAST(length(text) - (n - 1) AS DOUBLE) / n)
                    BETWEEN 2.0 AND 12.0) AS quality_ok,
               {sql_repetition_ok_duckdb()} AS rep_ok,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
        FROM base
    ),
    dedup AS (
        SELECT *,
               MIN(CASE WHEN NOT blocked AND quality_ok AND rep_ok
                        THEN doc_id END) OVER (PARTITION BY fp) AS keeper
        FROM flags
    )
    SELECT lang,
           CASE WHEN blocked THEN 'blocked'
                WHEN NOT quality_ok THEN 'quality'
                WHEN NOT rep_ok THEN 'repetition'
                WHEN doc_id <> keeper THEN 'duplicate'
                ELSE 'kept' END AS stage,
           COUNT(*) AS n_docs
    FROM dedup
    GROUP BY 1, 2
    """,
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus→training-set CAPSTONE: four curation families composed
    into one attribution funnel — provenance blocklist, quality gate
    (token count + mean token length), Gopher repetition filters, and
    exact content dedup among survivors (first-seen doc per normalized
    fingerprint wins) — each document attributed to its FIRST failing
    stage, reported per language. This is the per-stage loss report
    every production data pipeline publishes next to its training set.

    Scale: one scan computes all per-doc flags in-row (the same
    higher-order expressions as q_quality_score / q_repetition_signals);
    the only corpus shuffles are the fingerprint window (16-byte md5
    keys) and the final tiny groupBy. Stage order is fixed, so counts
    are additive: kept + stage losses = corpus."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", "source", "text",
        F.split(F.lower("text"), " ").alias("toks"),
    ).select(
        "doc_id", "lang", "source", "text", "toks",
        F.size("toks").alias("n"),
        F.expr(BIGRAMS_EXPR).alias("bg"),
    )
    mean_tok_len = (
        F.length("text") - (F.col("n") - 1)
    ).cast("double") / F.col("n")
    flags = base.select(
        "doc_id", "lang",
        F.col("source").isin(BLOCKED_SOURCES).alias("blocked"),
        ((F.col("n") >= 20) & mean_tok_len.between(2.0, 12.0)).alias("quality_ok"),
        repetition_ok_expr().alias("rep_ok"),
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp"),
    )
    from pyspark.sql import Window

    keeper = F.min(
        F.when(
            ~F.col("blocked") & F.col("quality_ok") & F.col("rep_ok"),
            F.col("doc_id"),
        )
    ).over(Window.partitionBy("fp"))
    staged = flags.withColumn("keeper", keeper).select(
        "lang",
        F.when(F.col("blocked"), "blocked")
        .when(~F.col("quality_ok"), "quality")
        .when(~F.col("rep_ok"), "repetition")
        .when(F.col("doc_id") != F.col("keeper"), "duplicate")
        .otherwise("kept")
        .alias("stage"),
    )
    return staged.groupBy("lang", "stage").agg(F.count(F.lit(1)).alias("n_docs"))
