"""Bucket-count deployment guards (ADVICE r11): the auto-derived count
is logged, and validate_bucket_count pins a count to a checkpoint so a
resize-induced mismatch fails loudly instead of re-sharding state."""

from __future__ import annotations

import logging

import pytest

from flink_wikipedia_spark.streaming.stateful import (
    default_bucket_count,
    validate_bucket_count,
)


def test_validate_pins_then_accepts_same(tmp_path):
    ck = str(tmp_path / "ck")
    assert validate_bucket_count(ck, 1024) == 1024
    assert (tmp_path / "ck" / "_bucket_count").read_text().strip() == "1024"
    assert validate_bucket_count(ck, 1024) == 1024  # idempotent resume


def test_validate_rejects_mismatch(tmp_path):
    ck = str(tmp_path / "ck")
    validate_bucket_count(ck, 1024)
    with pytest.raises(ValueError, match="1024"):
        validate_bucket_count(ck, 2048)


def test_resolve_logs_derived_count(spark, caplog):
    from flink_wikipedia_spark.streaming.stateful import resolve_bucket_count

    df = spark.range(1)
    with caplog.at_level(logging.WARNING,
                         logger="flink_wikipedia_spark.streaming.stateful"):
        derived = resolve_bucket_count(df, None, None, operator="op-under-test")
    expected = default_bucket_count(spark.sparkContext.defaultParallelism)
    assert derived == expected
    assert any(
        "op-under-test" in r.message and str(derived) in r.message
        for r in caplog.records
    )


def test_resolve_explicit_is_silent(spark, caplog):
    from flink_wikipedia_spark.streaming.stateful import resolve_bucket_count

    df = spark.range(1)
    with caplog.at_level(logging.WARNING,
                         logger="flink_wikipedia_spark.streaming.stateful"):
        assert resolve_bucket_count(df, 512, None, operator="op") == 512
    assert not caplog.records
