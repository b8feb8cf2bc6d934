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

from flink_wikipedia_spark.functions.compat import stable_token_hash
from flink_wikipedia_spark.plans.registry import query
from flink_wikipedia_spark.schemas import load_table

# Token budget of one packed training sequence, and the shard fan-out
# that keeps packing parallel (at 100 TB this is thousands, not 8).
PACK_BUDGET = 2048
PACK_SHARDS = 8

# Per-language keep rates in basis points (of 10_000): the classic
# mixture rebalance — downsample the dominant language, keep the rest.
SAMPLE_RATES_BP = {"en": 2500, "de": 7500, "es": 7500, "fr": 7500, "zh": 7500}
_RATE_ROWS = ", ".join(f"('{lg}', {bp})" for lg, bp in sorted(SAMPLE_RATES_BP.items()))


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

    Scale: the rate table is a tiny broadcast dim; the draw is a
    per-row expression in codegen; no shuffle at all — the sample of a
    100 TB corpus is a map-only scan."""
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        sorted(SAMPLE_RATES_BP.items()), "lang string, rate_bp long"
    )
    draw = (
        stable_token_hash(F.concat(F.lit("s|"), F.col("doc_id").cast("string")))
        % 10000
    ).alias("draw_bp")
    return (
        docs.join(rates, "lang")
        .select("doc_id", "lang", "rate_bp", draw)
        .filter(F.col("draw_bp") < F.col("rate_bp"))
    )
