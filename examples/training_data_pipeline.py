"""Example: an LLM training-data curation pass, end to end.

The north-star workload this engine exists for — raw documents in,
clean training corpus out, every stage a distributed DataFrame op:

    source blocklist → quality score → classifier score → LM
    perplexity cut → PII scrub →
    repetition gate →
    near-dup clusters → canonical pick → keep-list join →
    duplicated-span damage gate → contamination screen → stratified
    mixture sample → chunk + pack into training bins → deterministic
    shard shuffle → token-budget water-fill report

    python examples/training_data_pipeline.py

Each stage is the same operator the oracle-checked queries use
(plans/queries_text.py, plans/queries_dedup.py) — this file just
composes them the way a production curation job would.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_wikipedia_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_signatures,
)
from flink_wikipedia_spark.operators.graph import connected_components
from flink_wikipedia_spark.operators.text import quality_score_cols
from flink_wikipedia_spark.schemas import load_table
from flink_wikipedia_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example-curation", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    n_in = docs.count()

    # 0. provenance blocklist: broadcast LEFT ANTI before anything else
    #    touches the text (queries_curation.q_source_blocklist design)
    from flink_wikipedia_spark.plans.queries_curation import (
        BLOCKED_SOURCES,
        EMAIL_RE,
        IPV4_RE,
    )

    blocked = spark.createDataFrame([(s,) for s in BLOCKED_SOURCES], "source string")
    docs = docs.join(F.broadcast(blocked), "source", "left_anti")

    # 1. quality gate: cheap per-row signals, filter before anything heavy
    scored = docs.select("*", *quality_score_cols("text"))
    kept = scored.filter(F.col("keep") == 1)

    # 1a. model-based quality filter: hashed bag-of-words linear scorer
    #     (q_quality_classifier — the fastText/CCNet-style pass after
    #     the heuristics; swap in learned weights via
    #     operators/text.classifier_score_with_table)
    from flink_wikipedia_spark.operators.text import classifier_score_cols

    clf = kept.drop("keep").select("*", *classifier_score_cols("text"))
    kept = clf.filter(F.col("keep") == 1).drop(
        "n_tokens", "score_sum", "score_mean"
    )

    # 1a-bis. LM perplexity cut (q_lm_perplexity — the quality triad's
    #     third gate, CCNet shape; swap in a real KenLM table via
    #     operators/text.lm_score_with_table)
    from flink_wikipedia_spark.operators.text import with_lm_keep

    kept = with_lm_keep(kept.drop("keep")).filter(
        F.col("lm_keep") == 1
    ).drop("lm_keep")

    # 1b. PII scrub: map-only codegen regexp replace (q_pii_redact) —
    #     downstream stages see only redacted text
    kept = kept.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
    )

    # 1c. repetition gate (Gopher-style, q_repetition_signals design):
    #     duplicate-token and top-bigram fractions, computed fully
    #     in-row — map-only, no shuffle
    from flink_wikipedia_spark.operators.text import (
        BIGRAMS_EXPR,
        repetition_ok_expr,
    )

    staged = kept.select(
        "*", F.split(F.lower("text"), " ").alias("toks")
    ).select("*", F.size("toks").alias("n"), F.expr(BIGRAMS_EXPR).alias("bg"))
    kept = staged.filter(repetition_ok_expr()).drop("toks", "n", "bg")

    # 2. near-dup clusters over the survivors: MinHash → LSH candidates
    #    → connected components (transitive closure of "looks similar")
    pairs = minhash_candidate_pairs(minhash_signatures(kept))
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")

    # 3. canonical pick: keep the longest doc per cluster
    # no broadcast hint: the component map scales with dup count — AQE
    # broadcasts while small (see SCALE.md, canonical selection)
    labeled = (
        kept.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("component"), "n_chars")
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    keep_list = (
        labeled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id")
    )
    corpus = kept.join(keep_list, "doc_id", "left_semi")
    n_out = corpus.count()

    # 3b. duplicated-span damage gate: drop docs that are mostly
    #     cross-doc boilerplate (q_span_mask_stats design — only HIT
    #     spans expand into positions; hashes, never text, shuffle)
    from flink_wikipedia_spark.functions.compat import stable_token_hash
    from flink_wikipedia_spark.plans.queries_dedup import DUP_SPAN_N

    sp_t = F.col("toks")
    span_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(sp_t).cast("long") - DUP_SPAN_N),
        lambda i: F.concat_ws(
            " ", *[F.get(sp_t, (i + k).cast("int")) for k in range(DUP_SPAN_N)]
        ),
    )
    span_grams = (
        corpus.select("doc_id", F.split(F.lower("text"), " ").alias("toks"))
        .filter(F.size("toks") >= DUP_SPAN_N)
        .select("doc_id", F.posexplode_outer(span_arr).alias("i", "g"))
        .select("doc_id", "i", stable_token_hash("g").alias("h"))
    )
    dup_h = (
        span_grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    damaged = (
        span_grams.join(dup_h, "h")
        .select("doc_id", F.explode(F.sequence("i", F.col("i") + DUP_SPAN_N - 1)).alias("p"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_masked"))
        .join(corpus.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens")), "doc_id")
        .filter(F.col("n_masked") / F.col("n_tokens") > 0.5)
        .select("doc_id")
    )
    corpus = corpus.join(damaged, "doc_id", "left_anti")

    # 4. contamination screen: drop docs sharing ≥20% of their 5-gram
    #    hashes with the held-out benchmark set (every 97th doc) —
    #    hashes, never text, cross the wire (queries_text.py design)
    toks_col = F.split(F.lower(F.col("text")), " ")
    tcol = F.col("toks")
    grams_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(tcol).cast("long") - 5),
        lambda i: F.concat_ws(" ", *[F.get(tcol, (i + k).cast("int")) for k in range(5)]),
    )
    grams = (
        corpus.select("doc_id", toks_col.alias("toks"))
        .filter(F.size("toks") >= 5)
        .select("doc_id", F.explode_outer(F.array_distinct(grams_arr)).alias("g"))
        .select("doc_id", stable_token_hash("g").alias("h"))
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
        .withColumn("hit", F.lit(1))
    )
    contaminated = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "h", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") / F.count(F.lit(1))).alias("frac"))
        .filter(F.col("frac") >= 0.2)
        .select("doc_id")
    )
    clean = corpus.filter(F.col("doc_id") % 97 != 0).join(
        contaminated, "doc_id", "left_anti"
    )

    # 5. stratified mixture sample: md5-draw per doc, per-lang rates
    #    (reproducible under repartitioning, unlike df.sample)
    rates = spark.createDataFrame(
        [("en", 2500), ("de", 7500), ("es", 7500), ("fr", 7500), ("zh", 7500)],
        "lang string, rate_bp long",
    )
    draw = stable_token_hash(F.concat(F.lit("s|"), F.col("doc_id").cast("string"))) % 10000
    sampled = clean.join(rates, "lang").filter(draw < F.col("rate_bp"))

    # 6. pack into 2048-token training bins per (lang, shard): one
    #    running-sum window, sharded so no partition owns all of English
    w_pack = (
        Window.partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sampled.select(
        "doc_id", "lang",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    ).withColumn(
        "bin",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")) / 2048
        ).cast("long"),
    )
    n_bins = packed.select("lang", "shard", "bin").distinct().count()

    # 7. deterministic shard shuffle: md5-keyed (shard, pos) placement —
    #    one hash exchange, byte-identical shards on re-run
    #    (q_shuffle_shards design)
    sh = stable_token_hash(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string")))
    w_shuf = Window.partitionBy(F.col("h") % 16).orderBy("h", "doc_id")
    shards = (
        sampled.select("doc_id", sh.alias("h"))
        .select(
            "doc_id",
            (F.col("h") % 16).alias("shard"),
            F.row_number().over(w_shuf).alias("pos"),
        )
    )
    n_shards = shards.select("shard").distinct().count()

    # 8. token-budget mixture report: water-filling allocation of a
    #    fixed budget across the sampled corpus's sources
    #    (q_token_budget_waterfill design — one shuffle to |sources|
    #    rows, then window math on the tiny frame)
    from flink_wikipedia_spark.plans import REGISTRY  # noqa: F401 (registry import wires queries)
    from flink_wikipedia_spark.plans.queries_curation import TOKEN_BUDGET

    per_source = sampled.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    srcs = sorted(per_source.collect(), key=lambda r: (r.n_tokens, r.source))
    remaining, slots = TOKEN_BUDGET, len(srcs)
    alloc = {}
    for r in srcs:  # driver-side twin of the closed form: |sources| rows
        fair = remaining / slots
        take = min(r.n_tokens, fair)
        alloc[r.source] = take
        remaining -= take
        slots -= 1
    n_full = sum(1 for r in srcs if alloc[r.source] == r.n_tokens)

    print(f"documents in:          {n_in}")
    print(f"after blocklist:       {docs.count()}")
    print(f"after quality gates:   {kept.count()} (heuristic + classifier + LM)")
    print(f"after near-dup pass:   {n_out}")
    print(f"after span-damage gate:{corpus.count()}")
    print(f"after contamination:   {clean.count()}")
    print(f"after mixture sample:  {sampled.count()}")
    print(f"packed training bins:  {n_bins}")
    print(f"output shards:         {n_shards}")
    print(f"budget water-fill:     {len(srcs)} sources, "
          f"{n_full} fully taken, {TOKEN_BUDGET - round(remaining)} tokens allocated")
    spark.stop()


if __name__ == "__main__":
    main()
