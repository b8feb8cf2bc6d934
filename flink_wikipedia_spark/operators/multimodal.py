"""Multimodal column handling (north star E12).

Policy: image/audio/video ride through the engine as opaque ``binary``
payloads with typed metadata (schemas.MULTIMODAL_SCHEMA); Spark never
interprets the bytes. Decode / feature-extraction / resize /
frame-sampling run as **Arrow-batched Python** (mapInPandas), the only
sanctioned Python↔JVM crossing in the engine: payload batches move as
Arrow buffers, never row-at-a-time pickles.

Codecs: three dependency-free binary formats are decoded FOR REAL in
pure Python — PPM P6 (binary RGB image: ASCII header + raw pixel
bytes), WAV (RIFF container, 16-bit little-endian PCM), and FWV1 (a
minimal video container: magic + frame count + length-prefixed PPM
frames). ``real_decode`` parses headers/chunks byte-by-byte
(``decode_ppm`` / ``decode_wav`` / ``decode_fwv1``) and computes
features from the decoded pixels/samples; matching encoders
(``encode_ppm`` / ``encode_wav`` / ``encode_fwv1``) let the engine
synthesize valid payloads so q_multimodal_decode round-trips
encode→parse under a full DuckDB value oracle. Formats that need
external libraries (PNG/JPEG/MP3/H.264) still raise
NotImplementedError at the same seam. ``_decode_payload`` keeps the
older byte-statistics path for format-agnostic payload triage.

Scale notes: payload partitions should be sized by *bytes* not rows
(``spark.sql.files.maxPartitionBytes``); feature extraction is
embarrassingly parallel, so the only design question is batch shape —
mapInPandas yields per-batch DataFrames, keeping peak memory to one
Arrow batch of payloads per core.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def _decode_payload(payload: bytes | None, modality: str) -> dict:
    """Decode seam. Real codecs (PIL/libsndfile/ffmpeg) are unavailable
    here — ``real_decode=False`` callers get a deterministic
    byte-statistics fake; wiring a real codec means replacing this
    function body only."""
    if payload is None:
        # null payloads are data, not poison — never let one kill the job
        return {"n_bytes": 0, "checksum": 0, "mean_byte": 0.0}
    # Deterministic fake "decode": byte statistics of the payload.
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    mean = (sum(payload) / n) if n else 0.0
    return {"n_bytes": n, "checksum": checksum, "mean_byte": mean}


# ---------------------------------------------------------------------------
# Real dependency-free codecs: PPM P6 (image), WAV/PCM16 (audio), FWV1
# (video: length-prefixed PPM frames). Encoders exist so the engine can
# synthesize valid payloads for round-trip testing; decoders parse the
# byte streams for real (headers, chunk walks, struct unpacks). Formats
# that genuinely need external libraries (PNG/JPEG/MP3/H.264) still
# raise NotImplementedError at the same seam.
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize raw RGB bytes as a binary PPM (P6): ASCII header
    ``P6 <w> <h> 255`` then ``width*height*3`` pixel bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"PPM P6 {width}x{height} needs {width * height * 3} pixel "
            f"bytes, got {len(pixels)}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def encode_wav(samples: list[int], sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Serialize signed 16-bit mono PCM samples as a RIFF/WAVE file
    (``fmt `` chunk with PCM format tag 1, then a ``data`` chunk)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_fwv1(frames: list[bytes]) -> bytes:
    """Serialize PPM frames as FWV1, this engine's minimal video
    container: magic ``FWV1``, little-endian uint32 frame count, then
    per frame a uint32 byte length + the PPM payload."""
    out = [b"FWV1", struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def _ppm_tokens(payload: bytes, count: int) -> tuple[list[bytes], int]:
    """Read ``count`` whitespace-delimited header tokens, skipping
    ``#`` comments (the Netpbm spec allows them anywhere in the
    header). Returns (tokens, offset-just-past-last-token)."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < count:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < len(payload) and payload[j : j + 1] not in b" \t\r\n#":
                j += 1
            tokens.append(payload[i:j])
            i = j
    return tokens, i


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) byte-by-byte: magic, whitespace/comment-
    tolerant header tokens, single whitespace byte, raw RGB raster."""
    tokens, i = _ppm_tokens(payload, 4)
    if tokens[0] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {tokens[0]!r})")
    width, height, maxval = (int(t) for t in tokens[1:4])
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM maxval {maxval} out of range")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM rasters not supported")
    # exactly one whitespace byte separates header from raster; anything
    # else (e.g. a comment right after maxval) would silently shift the
    # raster offset and read wrong pixel bytes
    if payload[i : i + 1] not in (b" ", b"\t", b"\r", b"\n"):
        raise ValueError(
            f"PPM header not terminated by whitespace at offset {i} "
            f"(got {payload[i:i + 1]!r})"
        )
    i += 1
    n = width * height * 3
    raster = payload[i : i + n]
    if len(raster) != n:
        raise ValueError(f"PPM raster truncated: want {n}, got {len(raster)}")
    return {
        "width": width,
        "height": height,
        "n_pixel_bytes": n,
        "value_sum": sum(raster),
    }


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container: verify magic, walk chunks (id +
    uint32 size + body, bodies padded to even offsets), read the PCM
    format from ``fmt `` and signed 16-bit samples from ``data``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_len = struct.unpack("<I", payload[4:8])[0]
    if riff_len + 8 > len(payload):
        raise ValueError("RIFF size field exceeds payload")
    fmt = data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if len(body) != size:
            raise ValueError(f"chunk {cid!r} truncated")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunk bodies are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (format={audio_format}, bits={bits})"
        )
    if not 1 <= channels <= 64:
        # a malformed fmt chunk with channels=0 must be a controlled
        # parse error, not a ZeroDivisionError killing the Spark task
        raise ValueError(f"WAV channels={channels} out of supported range")
    n = len(data) // (2 * channels) * channels
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    return {
        "sample_rate": sample_rate,
        "n_samples": n // channels,
        "value_sum": sum(samples),
    }


def decode_fwv1(payload: bytes) -> dict:
    """Parse an FWV1 container: magic, uint32 frame count, then per
    frame uint32 length + PPM bytes; each frame is decoded with the
    real PPM parser and pixel sums are aggregated across frames."""
    if len(payload) < 8 or payload[:4] != b"FWV1":
        raise ValueError("not an FWV1 payload")
    n_frames = struct.unpack("<I", payload[4:8])[0]
    i, width, height, total = 8, 0, 0, 0
    for _ in range(n_frames):
        if i + 4 > len(payload):
            raise ValueError("FWV1 frame table truncated")
        flen = struct.unpack("<I", payload[i : i + 4])[0]
        frame = payload[i + 4 : i + 4 + flen]
        if len(frame) != flen:
            raise ValueError("FWV1 frame body truncated")
        f = decode_ppm(frame)
        width, height = f["width"], f["height"]
        total += f["value_sum"]
        i += 4 + flen
    return {
        "n_frames": n_frames,
        "width": width,
        "height": height,
        "value_sum": total,
    }


_MODALITY_BY_MAGIC = {b"P6": "image", b"RIFF": "audio", b"FWV1": "video"}


def real_decode(payload: bytes, modality: str) -> dict:
    """Codec-backed decode: sniffs the container magic and parses the
    payload for real. Supported formats (all dependency-free): PPM P6
    images, RIFF/WAVE PCM16 audio, FWV1 video. Returns a uniform
    feature dict; fields not applicable to the modality are 0.

    The container magic must agree with the row's ``modality`` tag — a
    WAV tagged "image" is corrupt metadata and raises ValueError rather
    than silently decoding as the wrong modality. Formats that require
    external codec libraries (PNG/JPEG/MP3/H.264, i.e. PIL / soundfile /
    av) raise NotImplementedError — that seam is deliberate and
    env-bound."""
    sniffed = _MODALITY_BY_MAGIC.get(
        payload[:2] if payload[:2] == b"P6" else payload[:4]
    )
    if sniffed is not None and sniffed != modality:
        raise ValueError(
            f"payload container is {sniffed!r} but row tagged "
            f"modality={modality!r} — metadata/payload mismatch"
        )
    base = {
        "width": 0,
        "height": 0,
        "n_frames": 0,
        "n_samples": 0,
        "sample_rate": 0,
        "value_sum": 0,
    }
    if payload[:2] == b"P6":
        d = decode_ppm(payload)
        base.update(
            width=d["width"], height=d["height"], n_frames=1,
            value_sum=d["value_sum"],
        )
    elif payload[:4] == b"RIFF":
        d = decode_wav(payload)
        base.update(
            n_samples=d["n_samples"], sample_rate=d["sample_rate"],
            value_sum=d["value_sum"],
        )
    elif payload[:4] == b"FWV1":
        d = decode_fwv1(payload)
        base.update(
            width=d["width"], height=d["height"], n_frames=d["n_frames"],
            value_sum=d["value_sum"],
        )
    else:
        raise NotImplementedError(
            "unrecognized container; PNG/JPEG/MP3/H.264 need codec "
            "libraries (PIL / soundfile / av) not installed here"
        )
    return base


VIDEO_W, VIDEO_H = 4, 2  # FWV1 synth frames are 4x2 RGB (24 raster bytes)


def synth_payload(asset_id: int, modality: str) -> bytes:
    """Deterministic real-format payload for an asset id: a PPM P6
    image, a PCM16 WAV, or an FWV1 clip whose decoded features are
    closed-form integer arithmetic on ``asset_id`` — which is what lets
    q_multimodal_decode carry a full DuckDB value oracle over a genuine
    encode→parse round trip."""
    if modality == "image":
        w, h = 4 + asset_id % 5, 3 + asset_id % 4
        raster = bytes((asset_id * 7 + i) % 256 for i in range(w * h * 3))
        return encode_ppm(w, h, raster)
    if modality == "audio":
        ns = 50 + asset_id % 64
        samples = [((asset_id * 13 + i * 9) % 4001) - 2000 for i in range(ns)]
        return encode_wav(samples)
    if modality == "video":
        nf = 1 + asset_id % 3
        frames = [
            encode_ppm(
                VIDEO_W,
                VIDEO_H,
                bytes(
                    (asset_id * 3 + f * 11 + j) % 256
                    for j in range(VIDEO_W * VIDEO_H * 3)
                ),
            )
            for f in range(nf)
        ]
        return encode_fwv1(frames)
    raise ValueError(f"unknown modality {modality!r}")


def synthesize_assets(ids: DataFrame) -> DataFrame:
    """(asset_id, modality) → (asset_id, modality, payload): Arrow-
    batched payload synthesis with the real encoders. Map-only, no
    shuffle; at scale this stage is where a production pipeline would
    instead read payload bytes from object storage."""
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "payload": [
                        synth_payload(int(a), m)
                        for a, m in zip(pdf["asset_id"], pdf["modality"])
                    ],
                }
            )

    return ids.mapInPandas(run, out_schema)


DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("value_sum", LongType()),
    ]
)


def decode_features(assets: DataFrame) -> DataFrame:
    """Codec-backed feature extraction: parse each binary payload with
    ``real_decode`` (PPM/WAV/FWV1 for real) and emit a narrow feature
    row. Same Arrow-batch shape as ``extract_features`` — map-only, no
    shuffle, peak memory one payload batch per core."""

    _NULL_FEATURES = {
        "width": 0, "height": 0, "n_frames": 0,
        "n_samples": 0, "sample_rate": 0, "value_sum": 0,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payloads are data, not poison (same policy as
            # _decode_payload / sample_frames): emit the zero-feature row
            feats = [
                _NULL_FEATURES if p is None else real_decode(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "value_sum": [f["value_sum"] for f in feats],
                }
            )

    return assets.mapInPandas(run, DECODE_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (asset_id, modality,
    payload). One pass, no shuffle; output is a narrow feature table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                }
            )
            yield out

    return assets.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame_len", LongType()),
    ]
)

FRAME_MAX_FRAMES = 4     # cap frames per asset
FRAME_BYTES_PER = 64     # one frame per 64 payload bytes, up to the cap
FRAME_SLICE_LEN = 32     # bytes sampled per frame


def sample_frames(assets: DataFrame) -> DataFrame:
    """Frame sampling: one asset row → N frame rows (the video/audio
    "take every k-th frame" shape), as a one-to-many mapInPandas.

    The frame PLAN is pure integer arithmetic on payload length —
    n_frames = clamp(n_bytes // 64, 1, 4), frame i at offset
    i * (n_bytes // n_frames) — so unlike the codec stub this op has a
    full DuckDB oracle (q_multimodal_frames): the UDF's fan-out is
    checked value-for-value against SQL, not just rows-only. A real
    decoder would slice actual frames at these offsets; the seam is
    the same as _decode_payload.

    Scale: fan-out happens inside the Arrow batch (no shuffle, no
    explode of materialized blobs through an exchange); output is a
    narrow frame index — downstream decode pulls bytes per frame only
    where needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(payload) if payload is not None else 0
                n_frames = max(1, min(FRAME_MAX_FRAMES, n // FRAME_BYTES_PER))
                stride = n // n_frames
                for i in range(n_frames):
                    off = i * stride
                    ids.append(aid)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(max(0, min(FRAME_SLICE_LEN, n - off)))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame_len": lens,
                }
            )

    return assets.mapInPandas(run, FRAME_SCHEMA)


def resize_payload(assets: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Binary→binary transform plumbing (the image-resize shape):
    payload replaced by a deterministic fixed-size rendition — truncate
    long payloads, zero-pad short ones. A real implementation swaps the
    slice/pad for PIL's resize; schema, Arrow batching, and the
    binary-in/binary-out contract are exactly what production needs.

    Scale: in-place per-batch transform, no shuffle; output payloads
    are fixed-size so downstream partition sizing is predictable
    (rows × target_bytes)."""
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                (bytes(p[:target_bytes]).ljust(target_bytes, b"\x00"))
                if p is not None
                else bytes(target_bytes)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "payload": resized,
                }
            )

    return assets.mapInPandas(run, out_schema)
