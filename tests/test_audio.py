"""WAV/PCM audio codec: roundtrips across bit depths, exact integer
features, the distributed audio_features path, error channel."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from space_launch_telemetry_analyzer_spark.operators import multimodal as M
from space_launch_telemetry_analyzer_spark.operators.audio import (
    audio_features,
    decode_wav,
    encode_wav,
)


def _wav(fmt_code, channels, rate, bits, data):
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                      rate * channels * (bits // 8), channels * (bits // 8),
                      bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_roundtrip_16bit_and_features():
    s = (np.sin(np.arange(1000) / 20) * 20000).astype(np.int16)
    d = decode_wav(encode_wav(s, 8000), return_samples=True)
    assert (d["n_samples"], d["sample_rate"], d["channels"]) == (1000, 8000, 1)
    assert np.array_equal(d["samples"][:, 0], s.astype(np.int32))
    assert d["abs_sum"] == int(np.abs(s.astype(np.int64)).sum())
    assert d["peak"] == int(np.abs(s.astype(np.int64)).max())
    assert d["duration_s"] == pytest.approx(0.125)
    st = np.stack([s, -s], axis=1).astype(np.int16)
    d2 = decode_wav(encode_wav(st, 44100))
    assert d2["channels"] == 2 and d2["n_samples"] == 1000
    assert d2["abs_sum"] == 2 * d["abs_sum"]


def test_bit_depths_normalize_to_16bit_range():
    d = decode_wav(_wav(1, 1, 8000, 8, bytes([0, 128, 255, 200])),
                   return_samples=True)
    assert d["samples"][:, 0].tolist() == [-32768, 0, 32512, 18432]
    # 24-bit: sign extension + >>8
    v = struct.pack("<i", -(1 << 22))[:3] + struct.pack("<i", 1 << 22)[:3]
    d = decode_wav(_wav(1, 1, 8000, 24, v), return_samples=True)
    assert d["samples"][:, 0].tolist() == [-(1 << 14), 1 << 14]
    # 32-bit int: >>16
    v = struct.pack("<ii", 1 << 30, -(1 << 30))
    d = decode_wav(_wav(1, 1, 8000, 32, v), return_samples=True)
    assert d["samples"][:, 0].tolist() == [1 << 14, -(1 << 14)]
    # 32-bit float (format 3): clipped *32767, rint
    f = np.array([0.5, -1.0, 2.0], dtype="<f4").tobytes()
    d = decode_wav(_wav(3, 1, 8000, 32, f), return_samples=True)
    assert d["samples"][:, 0].tolist() == [16384, -32767, 32767]


def test_unsupported_and_malformed():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"junk")
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(_wav(2, 1, 8000, 4, b"\x00\x00"))  # ADPCM
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(_wav(1, 1, 8000, 12, b"\x00\x00"))


def test_magic_and_chaos():
    s = np.arange(100, dtype=np.int16)
    wav = encode_wav(s)
    assert M.sniff_magic(wav) == "wav"
    rng = np.random.default_rng(3)
    for trial in range(200):
        mut = bytearray(wav)
        if trial % 2:
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        else:
            mut = mut[: rng.integers(0, len(mut))]
        try:
            d = decode_wav(bytes(mut))
            assert d["n_samples"] >= 0
        except ValueError:
            pass


def test_audio_features_distributed(spark):
    s = (np.arange(500) % 97).astype(np.int16)
    rows = [(1, encode_wav(s, 16000)), (2, b"RIFFxxxxWAVEbroken"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           audio_features(df, "media_id", "payload").collect()}
    assert out[1]["error"] is None and out[1]["n_samples"] == 500
    assert out[1]["abs_sum"] == int(np.abs(s.astype(np.int64)).sum())
    assert out[2]["error"] is not None and out[3]["error"] is not None
