"""Example: an LLM training-data curation pass, end to end.

The north-star workload this engine exists for — raw documents in,
clean training corpus out, every stage a distributed DataFrame op:

    quality score → language ID → near-dup clusters → canonical pick
    → keep-list join → TF-IDF salience on the survivors

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

    # 1. quality gate: cheap per-row signals, filter before anything heavy
    scored = docs.select("*", *quality_score_cols("text"))
    kept = scored.filter(F.col("keep") == 1)

    # 2. near-dup clusters over the survivors: MinHash → LSH candidates
    #    → connected components (transitive closure of "looks similar")
    pairs = minhash_candidate_pairs(minhash_signatures(kept))
    comp = connected_components(pairs).withColumnRenamed("node", "doc_id")

    # 3. canonical pick: keep the longest doc per cluster
    labeled = (
        kept.select("doc_id", "n_chars")
        .join(F.broadcast(comp), "doc_id", "left")
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

    # 4. salience snapshot of the final corpus (log-free BM25 idf)
    toks = corpus.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.desc("df"), "token").limit(5).collect()

    print(f"documents in:        {n_in}")
    print(f"after quality gate:  {kept.count()}")
    print(f"after near-dup pass: {n_out}")
    print("most common tokens in final corpus:", [r.token for r in top])
    spark.stop()


if __name__ == "__main__":
    main()
