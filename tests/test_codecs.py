"""Unit tests for the dependency-free binary codecs
(operators/multimodal.py): PPM P6, RIFF/WAVE PCM16, FWV1.

Pure-Python round trips and malformed-input edges first (no Spark), then
the Arrow decode pipeline's null handling on a real session.
"""

from __future__ import annotations

import struct

import pytest

from flink_wikipedia_spark.operators.multimodal import (
    decode_fwv1,
    decode_ppm,
    decode_wav,
    encode_fwv1,
    encode_ppm,
    encode_wav,
    real_decode,
    synth_payload,
)


# --- PPM -------------------------------------------------------------------


def test_ppm_roundtrip():
    pixels = bytes(range(2 * 3 * 3))
    d = decode_ppm(encode_ppm(2, 3, pixels))
    assert d["width"] == 2 and d["height"] == 3
    assert d["n_pixel_bytes"] == 18
    assert d["value_sum"] == sum(pixels)


def test_ppm_comment_tolerant_header():
    # Netpbm allows comments between header tokens
    payload = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes(6)
    d = decode_ppm(payload)
    assert (d["width"], d["height"]) == (2, 1)


def test_ppm_comment_after_maxval_rejected():
    # a comment directly after maxval would shift the raster offset;
    # the parser must refuse rather than read wrong pixel bytes
    payload = b"P6\n2 1\n255#c\n" + bytes(6)
    with pytest.raises(ValueError, match="whitespace"):
        decode_ppm(payload)


def test_ppm_truncated_raster():
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))  # wants 12


def test_ppm_truncated_header():
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2")


def test_ppm_bad_magic_and_maxval():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n0\n\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_ppm_encode_rejects_wrong_raster_size():
    with pytest.raises(ValueError):
        encode_ppm(2, 2, bytes(5))


# --- WAV -------------------------------------------------------------------


def test_wav_roundtrip():
    samples = [0, 100, -100, 32767, -32768]
    d = decode_wav(encode_wav(samples, sample_rate=44100))
    assert d["sample_rate"] == 44100
    assert d["n_samples"] == len(samples)
    assert d["value_sum"] == sum(samples)


def test_wav_zero_channels_is_parse_error_not_crash():
    payload = bytearray(encode_wav([1, 2, 3]))
    # fmt chunk body starts at 20; channels is its 2nd uint16
    assert payload[12:16] == b"fmt "
    struct.pack_into("<H", payload, 22, 0)
    with pytest.raises(ValueError, match="channels"):
        decode_wav(bytes(payload))


def test_wav_bad_container_and_missing_chunks():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + bytes(20))
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(NotImplementedError):
        # format tag 7 (mu-law) at the same offsets
        payload = bytearray(encode_wav([1]))
        struct.pack_into("<H", payload, 20, 7)
        decode_wav(bytes(payload))


def test_wav_odd_chunk_padding():
    # an odd-sized junk chunk before data must be skipped with 2-byte
    # alignment or every later chunk misparses
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    data = b"data" + struct.pack("<I", 4) + struct.pack("<hh", 5, -5)
    body = b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt + data
    d = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert d["n_samples"] == 2 and d["value_sum"] == 0


# --- FWV1 ------------------------------------------------------------------


def test_fwv1_roundtrip():
    frames = [
        encode_ppm(2, 1, bytes([10, 20, 30, 40, 50, 60])),
        encode_ppm(2, 1, bytes([1, 2, 3, 4, 5, 6])),
    ]
    d = decode_fwv1(encode_fwv1(frames))
    assert d["n_frames"] == 2
    assert (d["width"], d["height"]) == (2, 1)
    assert d["value_sum"] == 210 + 21


def test_fwv1_truncated_frame():
    good = encode_fwv1([encode_ppm(1, 1, bytes(3))])
    with pytest.raises(ValueError, match="truncated"):
        decode_fwv1(good[:-1])
    with pytest.raises(ValueError, match="FWV1"):
        decode_fwv1(b"NOPE" + bytes(8))


# --- dispatch + synth ------------------------------------------------------


def test_real_decode_modality_mismatch_rejected():
    wav = encode_wav([1, 2])
    with pytest.raises(ValueError, match="mismatch"):
        real_decode(wav, "image")
    ppm = encode_ppm(1, 1, bytes(3))
    with pytest.raises(ValueError, match="mismatch"):
        real_decode(ppm, "video")


def test_real_decode_unknown_container():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG\r\n\x1a\n" + bytes(16), "image")


@pytest.mark.parametrize("modality", ["image", "audio", "video"])
def test_synth_payload_closed_form(modality):
    """The property the q_multimodal_decode oracle depends on: decoded
    features of a synth payload are pure integer arithmetic on the id."""
    for aid in (0, 1, 7, 63, 64, 9999):
        d = real_decode(synth_payload(aid, modality), modality)
        if modality == "image":
            w, h = 4 + aid % 5, 3 + aid % 4
            assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
            assert d["value_sum"] == sum(
                (aid * 7 + i) % 256 for i in range(w * h * 3)
            )
        elif modality == "audio":
            ns = 50 + aid % 64
            assert d["n_samples"] == ns and d["sample_rate"] == 8000
            assert d["value_sum"] == sum(
                ((aid * 13 + i * 9) % 4001) - 2000 for i in range(ns)
            )
        else:
            nf = 1 + aid % 3
            assert (d["width"], d["height"], d["n_frames"]) == (4, 2, nf)
            assert d["value_sum"] == sum(
                (aid * 3 + f * 11 + j) % 256
                for f in range(nf)
                for j in range(24)
            )


def test_decode_features_null_payload_yields_zero_row(spark):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from flink_wikipedia_spark.operators.multimodal import decode_features

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "image", synth_payload(1, "image")), (2, "audio", None)],
        schema,
    )
    rows = {r.asset_id: r for r in decode_features(df).collect()}
    assert rows[2].value_sum == 0 and rows[2].n_samples == 0
    assert rows[1].width == 4 + 1 % 5
