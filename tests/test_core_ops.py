"""Reference-parity operator tests (SURVEY.md §5.2 layer 3/4).

The decode tests use the exact sample payload documented in the
reference (``DataStreamJob.java:51-59``), including the corrupt-record
case the reference NPEs on (SURVEY.md §3.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_wikipedia_spark.operators.core import (
    build_flagship_batch,
    decode_edit_events,
    edit_size_by_domain,
    encode_json,
    filter_human_main,
)

# The reference's documented sample event (DataStreamJob.java:51-59):
# id arrives as a JSON *number*; the reference stores it as string.
SAMPLE = (
    '{"id": 1698671021, "domain": "en.wikipedia.org", '
    '"namespace": "main namespace", '
    '"title": "List of Zimbabwe Twenty20 International cricket records", '
    '"timestamp": "2023-11-27T19:19:29Z", "user_name": "Faraz Master", '
    '"user_type": "human", "old_length": 126239, "new_length": 126151}'
)


def _decode(spark, payloads):
    raw = spark.createDataFrame([(p,) for p in payloads], "value string")
    return decode_edit_events(raw)


def test_decode_sample_payload(spark):
    row = _decode(spark, [SAMPLE]).collect()[0]
    assert row.id == "1698671021"  # number→string coercion preserved
    assert row.domain == "en.wikipedia.org"
    assert row.old_length == 126239 and row.new_length == 126151
    assert row.ts is not None and row.ts.year == 2023
    assert row._corrupt_record is None


def test_decode_missing_field_does_not_fail(spark):
    # The reference NPEs here (JsonNodeDeserializationSchema.java:27-35).
    rows = _decode(spark, ['{"domain": "x.org", "user_type": "human"}']).collect()
    assert len(rows) == 1
    assert rows[0].domain == "x.org"
    assert rows[0].old_length is None


def test_decode_malformed_json_goes_to_corrupt_record(spark):
    rows = _decode(spark, ["{not json!"]).collect()
    assert rows[0]._corrupt_record == "{not json!"
    assert rows[0].domain is None


def test_filter_human_main_is_case_insensitive(spark):
    # equalsIgnoreCase semantics (DataStreamJob.java:71-72)
    payloads = [
        SAMPLE,
        SAMPLE.replace('"human"', '"HUMAN"').replace(
            '"main namespace"', '"Main Namespace"'
        ),
        SAMPLE.replace('"human"', '"bot"'),
        SAMPLE.replace('"main namespace"', '"talk"'),
    ]
    kept = filter_human_main(_decode(spark, payloads)).collect()
    assert len(kept) == 2


def test_flagship_batch_sums_abs_edit_sizes(spark):
    payloads = []
    for i, (old, new) in enumerate([(100, 150), (150, 120), (10, 10)]):
        payloads.append(
            SAMPLE.replace("126239", str(old)).replace("126151", str(new))
        )
    out = build_flagship_batch(_decode(spark, payloads)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.domain == "en.wikipedia.org"
    assert row.edit_size == 50 + 30 + 0  # Σ|new−old|, abs case included
    assert (row.window_end - row.window_start).total_seconds() == 300


def test_edit_size_by_domain_groups_keys(spark):
    payloads = [
        SAMPLE,
        SAMPLE.replace("en.wikipedia.org", "de.wikipedia.org"),
        SAMPLE.replace("en.wikipedia.org", "de.wikipedia.org"),
    ]
    out = {r.domain: r.edit_size for r in
           edit_size_by_domain(_decode(spark, payloads)).collect()}
    assert out == {"en.wikipedia.org": 88, "de.wikipedia.org": 176}


def test_encode_json_round_trips(spark):
    df = _decode(spark, [SAMPLE])
    out = encode_json(df.select("domain", "new_length"), "domain", "new_length")
    assert out.collect()[0].json == '{"domain":"en.wikipedia.org","new_length":126151}'


def test_decode_malformed_timestamp_survives_ansi(spark):
    """Poison-message resilience under ANSI mode: a garbage timestamp
    must null out (try_to_timestamp), not kill the job — the failure
    mode the reference has for any malformed field (SURVEY.md §3.3)."""
    rows = _decode(
        spark, [SAMPLE.replace("2023-11-27T19:19:29Z", "not-a-timestamp")]
    ).collect()
    assert len(rows) == 1
    assert rows[0].ts is None
    assert rows[0].domain == "en.wikipedia.org"  # rest of the row intact
