"""Example: LLM-corpus dedup, sketch-then-verify.

MinHash signatures → LSH banding candidates → exact Jaccard → keep list:

    python examples/corpus_dedup.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_wikipedia_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_dedup_clusters,
    minhash_signatures,
)
from flink_wikipedia_spark.schemas import load_table
from flink_wikipedia_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-dedup", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    sigs = minhash_signatures(docs)
    pairs = minhash_candidate_pairs(sigs)
    clusters = minhash_dedup_clusters(sigs)

    n_docs = docs.count()
    n_pairs = pairs.count()
    print(f"{n_docs} docs → {n_pairs} candidate near-dup pairs "
          f"(vs {n_docs * (n_docs - 1) // 2} brute-force comparisons)")
    print("largest dup clusters:")
    clusters.orderBy(F.desc("n_members")).show(5, truncate=False)


if __name__ == "__main__":
    main()
