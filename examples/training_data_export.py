"""Example: training-data EXPORT, end to end — the artifact ships.

examples/training_data_pipeline.py composes the curation operators and
prints a report; THIS example drives the same funnel all the way to the
thing a training run actually consumes: parquet shard files of BPE
token-id sequences, plus an ACCOUNTING DataFrame that explains, doc by
doc and token by token, where the corpus went:

    quality triad (heuristic → classifier → LM perplexity)
      → exact dedup (normalized-md5, keep first)
      → NEAR dedup (MinHash → LSH → components, keep longest)
      → contamination screen (benchmark 5-gram overlap)
      → BPE tokenize (learn merges → per-doc token-id sequences)
      → pack into fixed-token training bins     (q_pack_sequences)
      → deterministic shard shuffle             (q_shuffle_shards)
      → write parquet shards partitioned by shard

Accounting is ADDITIVE BY CONSTRUCTION (the q_quality_triad_funnel
discipline): every document is attributed to the FIRST stage that
dropped it via one row-local/join-flag `when` chain, so
Σ stage.n_docs = corpus size exactly — no double counting, no gaps.

    python examples/training_data_export.py
    SPARK_GRAFT_EXPORT_DIR=/tmp/shards python examples/training_data_export.py

Every stage is the same operator the oracle-checked queries use
(plans/queries_text.py, plans/queries_dedup.py, plans/queries_curation.py)
— this file composes them the way a production export job would.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_wikipedia_spark.functions.compat import stable_token_hash
from flink_wikipedia_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_signatures,
)
from flink_wikipedia_spark.operators.graph import connected_components
from flink_wikipedia_spark.operators.text import (
    BPE_NUM_MERGES,
    BPE_WRAP_L,
    BPE_WRAP_R,
    bpe_apply_merges_expr,
    bpe_learn_merges,
    bpe_wrap_word_expr,
    classifier_score_cols,
    quality_score_cols,
    with_lm_keep,
)
from flink_wikipedia_spark.schemas import load_table
from flink_wikipedia_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
PACK_BUDGET = 2048  # tokens per training bin (q_pack_sequences discipline)
PACK_SHARDS = 8     # parallel packing streams per language
OUT_SHARDS = 16     # final shard-file fan-out (q_shuffle_shards discipline)


def main() -> None:
    spark = get_spark("example-export", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.environ.get("SPARK_GRAFT_EXPORT_DIR") or tempfile.mkdtemp(
        prefix="training_shards_"
    )

    # ------------------------------------------------------------------
    # Per-doc stage flags. All three triad gates are row-local
    # expressions (one scan, zero exchanges); the dedup/contamination
    # flags come from keep-list joins. The `when` chain below attributes
    # each doc to its FIRST failing stage, so stage counts are additive.
    # ------------------------------------------------------------------
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    n_corpus = docs.count()

    staged = docs.select(
        "doc_id", "lang", "n_chars", "text",
        quality_score_cols("text")[3].alias("h_keep"),
        classifier_score_cols("text")[3].alias("c_keep"),
    )
    staged = with_lm_keep(staged)
    triad_ok = (
        (F.col("h_keep") == 1) & (F.col("c_keep") == 1) & (F.col("lm_keep") == 1)
    )
    # `flags` carries EVERY corpus doc through to the funnel groupBy;
    # the stage keep-lists below are computed on the surviving subsets
    # (dedup runs among triad survivors, etc.) and LEFT-join back, so
    # dropping never removes a row from the accounting frame.
    flags = staged
    triad_survivors = staged.filter(triad_ok)

    # exact dedup: normalized-md5 fingerprint, first (min doc_id) keeps
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    exact_keep = (
        triad_survivors.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .withColumn("x_keep", F.lit(1))
    )
    flags = flags.join(exact_keep, "doc_id", "left")
    exact_survivors = triad_survivors.join(
        exact_keep.drop("x_keep"), "doc_id", "left_semi"
    )

    # near dedup: MinHash → LSH candidates → connected components,
    # longest doc per component keeps (the q_dedup_canonical pick)
    pairs = minhash_candidate_pairs(minhash_signatures(exact_survivors))
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")
    labeled = (
        exact_survivors.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
            "n_chars",
        )
    )
    w_canon = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    near_keep = (
        labeled.withColumn("rk", F.row_number().over(w_canon))
        .filter(F.col("rk") == 1)
        .select("doc_id")
        .withColumn("nd_keep", F.lit(1))
    )
    flags = flags.join(near_keep, "doc_id", "left")
    near_survivors = exact_survivors.join(
        near_keep.drop("nd_keep"), "doc_id", "left_semi"
    )

    # contamination screen: docs sharing >=20% of their 5-gram hashes
    # with the held-out benchmark set (every 97th doc) drop; hashes,
    # never text, cross the wire
    tcol = F.col("toks")
    grams_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), F.size(tcol).cast("long") - 5),
        lambda i: F.concat_ws(
            " ", *[F.get(tcol, (i + k).cast("int")) for k in range(5)]
        ),
    )
    grams = (
        near_survivors.select(
            "doc_id", F.split(F.lower("text"), " ").alias("toks")
        )
        .filter(F.size("toks") >= 5)
        .select("doc_id", F.explode(F.array_distinct(grams_arr)).alias("g"))
        .select("doc_id", stable_token_hash("g").alias("h"))
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select("h").distinct()
        .withColumn("hit", F.lit(1))
    )
    contaminated = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "h", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") / F.count(F.lit(1))).alias("frac"))
        .filter(F.col("frac") >= 0.2)
        .select("doc_id")
        .withColumn("cont_hit", F.lit(1))
    )
    flags = flags.join(contaminated, "doc_id", "left").withColumn(
        "is_bench", (F.col("doc_id") % 97 == 0).cast("int")
    )

    # ------------------------------------------------------------------
    # The additive funnel: first-failing-stage attribution, one tiny
    # groupBy. Whitespace-token mass per stage rides along so the
    # report answers both "how many docs" and "how many tokens".
    # ------------------------------------------------------------------
    stage = (
        F.when(F.col("h_keep") == 0, F.lit("1_quality_heuristic"))
        .when(F.col("c_keep") == 0, F.lit("2_quality_classifier"))
        .when(F.col("lm_keep") == 0, F.lit("3_quality_lm"))
        .when(F.col("x_keep").isNull(), F.lit("4_dedup_exact"))
        .when(F.col("nd_keep").isNull(), F.lit("5_dedup_near"))
        .when(F.col("is_bench") == 1, F.lit("6_benchmark_holdout"))
        .when(F.col("cont_hit") == 1, F.lit("6_contaminated"))
        .otherwise(F.lit("7_kept"))
    )
    ws_tokens = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    ).cast("long")
    accounting = (
        flags.select(stage.alias("stage"), ws_tokens.alias("n_ws_tokens"))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws_tokens").alias("n_ws_tokens"),
        )
        .orderBy("stage")
    )
    acc_rows = accounting.collect()
    # Σ n_docs over stages = corpus exactly — the additive guarantee
    # this example exists to demonstrate.
    assert sum(r.n_docs for r in acc_rows) == n_corpus, (
        acc_rows, n_corpus,
    )

    clean = flags.filter(stage == "7_kept").select("doc_id", "lang", "text")

    # ------------------------------------------------------------------
    # BPE tokenize the clean corpus: learn merges on the SURVIVORS (the
    # corpus the model will actually see), assign ids over the final
    # vocabulary (q_bpe_ids discipline: count desc, symbol asc, special
    # ids reserved), encode every doc to its token-id sequence.
    # ------------------------------------------------------------------
    words = (
        clean.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = [
        (r.merge_rank, r.lsym, r.rsym, r.merged, r.pair_count)
        for r in bpe_learn_merges(words, BPE_NUM_MERGES).collect()
    ]
    vseg = bpe_wrap_word_expr("word")
    for _, a, b, _, _ in sorted(merges, key=lambda m: m[0]):
        vseg = F.replace(
            vseg,
            F.lit(BPE_WRAP_L + a + BPE_WRAP_R + BPE_WRAP_L + b + BPE_WRAP_R),
            F.lit(BPE_WRAP_L + a + b + BPE_WRAP_R),
        )
    vsyms = F.split(
        F.btrim(vseg, F.lit(BPE_WRAP_L + BPE_WRAP_R)), BPE_WRAP_R + BPE_WRAP_L
    )
    vocab_rows = (
        words.select("freq", F.explode(vsyms).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("symbol").asc())
        .collect()
    )
    id_map = {r.symbol: 4 + i for i, r in enumerate(vocab_rows)}
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
    encoded = clean.select(
        "doc_id",
        "lang",
        F.transform(syms, lambda s: F.element_at(map_lit, s)).alias("ids"),
    ).withColumn("n_tokens", F.size("ids").cast("long"))

    # ------------------------------------------------------------------
    # Pack into PACK_BUDGET-token bins per (lang, shard) — one running-
    # sum window over sharded streams (q_pack_sequences), then place
    # every doc at a deterministic (shard, pos) via the md5 key
    # (q_shuffle_shards) and write parquet partitioned by shard.
    # ------------------------------------------------------------------
    w_pack = (
        Window.partitionBy("lang", F.col("doc_id") % PACK_SHARDS)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = encoded.withColumn(
        "bin",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")) / PACK_BUDGET
        ).cast("long"),
    )
    h = stable_token_hash(
        F.concat(F.lit("shuf|"), F.col("doc_id").cast("string"))
    )
    w_shuf = Window.partitionBy(F.col("h") % OUT_SHARDS).orderBy("h", "doc_id")
    shards = (
        packed.withColumn("h", h)
        .withColumn("shard", (F.col("h") % OUT_SHARDS).cast("long"))
        .withColumn("pos", F.row_number().over(w_shuf).cast("long"))
        .select("shard", "pos", "doc_id", "lang", "bin", "n_tokens", "ids")
    )
    shards.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    # ------------------------------------------------------------------
    # Report.
    # ------------------------------------------------------------------
    print(f"corpus: {n_corpus} docs  →  export: {out_dir}")
    print("funnel accounting (first-failing-stage attribution, additive):")
    for r in acc_rows:
        print(f"  {r.stage:<22} {r.n_docs:>8} docs  {r.n_ws_tokens:>10} ws-tokens")
    back = spark.read.parquet(out_dir)
    n_exp, n_tok = back.count(), back.agg(F.sum("n_tokens")).first()[0]
    n_shards = back.select("shard").distinct().count()
    print(
        f"exported {n_exp} docs / {n_tok} BPE tokens into {n_shards} "
        f"shards ({len(merges)} learned merges, vocab {len(id_map)})"
    )
    kept = {r.stage: r.n_docs for r in acc_rows}.get("7_kept", 0)
    assert n_exp == kept, (n_exp, kept)
    if not os.environ.get("SPARK_GRAFT_EXPORT_DIR"):
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
