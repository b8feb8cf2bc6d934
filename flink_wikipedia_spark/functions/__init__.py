"""Shared column expressions.

Split into:
    compat.py     oracle-deterministic expression builders (Spark side)
                  with the exact DuckDB SQL twin documented per helper
    constants.py  deterministic constants shared by Spark queries and
                  generated oracle SQL (MinHash coefficients, LSH
                  hyperplanes, stopword lists)
"""

from flink_wikipedia_spark.functions.compat import (
    dec_avg,
    dec_sum,
    ensure_session_conf,
    stable_token_hash,
    ts_bucket,
)

__all__ = [
    "dec_avg",
    "dec_sum",
    "ensure_session_conf",
    "stable_token_hash",
    "ts_bucket",
]
