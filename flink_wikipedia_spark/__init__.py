"""flink_wikipedia_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``tdelamater1/flink-wikipedia`` (a single Flink DataStream job:
Kafka → JSON decode → filter → project → keyed 5-minute tumbling window
→ sum(abs(new_length - old_length)) → Mongo; see
``/root/reference/src/main/java/xyz/delamater/DataStreamJob.java:49-91``),
widened to the full operator surface a 100 TB training-data pipeline
needs: relational breadth (joins, sorts, set ops, rollup/cube, analytic
windows), deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup), similarity search (brute-force + LSH-bucketed
cosine top-k), text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Design stance (SURVEY.md §1.4, §4): everything is declared with the
DataFrame/SQL API so Catalyst owns pushdown, pruning, join selection and
AQE owns runtime re-planning. Python UDFs appear only where built-in
expressions genuinely cannot express the semantics (multimodal decode).

Layout:
    session.py    SparkSession factory (AQE, UTC, Arrow, shuffle sizing)
    schemas.py    explicit StructType constants + testdata loaders
    functions/    oracle-deterministic column expressions & constants
    operators/    core (reference parity), relational, dedup,
                  similarity, text, multimodal
    plans/        flagship pipeline composition (batch)
    streaming/    Structured Streaming pipeline, sources, sinks
"""

from flink_wikipedia_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
