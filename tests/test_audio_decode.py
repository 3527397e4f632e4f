"""Hand-built WAV fixtures for the numpy PCM16 decoder: well-formed
mono/stereo, extra chunks, word-alignment padding, and poison payloads
that must degrade to decode_ok=false, never kill the batch."""

from __future__ import annotations

import struct

import numpy as np

from graphsense_blocksci_spark.operators.multimodal import (
    _parse_wav,
    decode_audio,
)


def _wav(
    samples: np.ndarray,
    rate: int = 16000,
    channels: int = 1,
    extra_chunk: bytes = b"",
    fmt_tag: int = 1,
    bits: int = 16,
) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate, rate * channels * 2, channels * 2, bits
    )
    body = (
        b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + extra_chunk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_parse_mono():
    s = np.array([0, 1, -1, 32767, -32768], dtype="<i2")
    rate, ch, got = _parse_wav(_wav(s))
    assert (rate, ch) == (16000, 1)
    assert got.tolist() == s.tolist()


def test_parse_stereo_and_extra_chunk():
    s = np.array([5, -5, 100, -100], dtype="<i2")
    # LIST chunk with odd size exercises the word-alignment skip
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, ch, got = _parse_wav(_wav(s, rate=44100, channels=2, extra_chunk=extra))
    assert (rate, ch) == (44100, 2)
    assert got.tolist() == s.tolist()


def test_poison_payloads():
    s = np.array([1, 2], dtype="<i2")
    good = _wav(s)
    assert _parse_wav(good) is not None
    assert _parse_wav(b"") is None
    assert _parse_wav(b"RIFX" + good[4:]) is None  # big-endian RIFF
    assert _parse_wav(good[:20]) is None  # truncated
    assert _parse_wav(_wav(s, fmt_tag=3)) is None  # float PCM
    assert _parse_wav(_wav(s, bits=8)) is None  # 8-bit
    # odd data size
    bad = good[:-1]
    trimmed = bad[: len(bad) - 0]
    assert _parse_wav(trimmed) is None


def test_decode_audio_dataframe(spark):
    s = np.array([0, 256, -256, 1024], dtype="<i2")
    rows = [
        (0, bytearray(_wav(s))),
        (1, bytearray(b"not a wav")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert got[0]["decode_ok"]
    assert got[0]["n_samples"] == 4
    assert got[0]["abs_sum"] == 0 + 256 + 256 + 1024
    assert got[0]["peak"] == 1024
    assert not got[1]["decode_ok"]
    assert not got[2]["decode_ok"]


def test_audio_frame_features_parity(spark):
    from graphsense_blocksci_spark.operators.multimodal import (
        audio_frame_features,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=23, dtype=np.int64).astype("<i2")
    rows = [
        (0, bytearray(_wav(s))),
        (1, bytearray(b"not a wav")),  # poison: emits no rows
        (2, bytearray(_wav(s[:3]))),  # shorter than one frame: no rows
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["frame_idx"]: r
        for r in audio_frame_features(df, frame_size=5).collect()
        if r["media_id"] == 0
    }
    all_ids = {
        r["media_id"] for r in audio_frame_features(df, frame_size=5).collect()
    }
    assert all_ids == {0}  # poison + short payloads emit nothing
    # numpy reference: 4 full frames of 5, tail of 3 dropped
    sl = s.astype("int64")
    assert sorted(got) == [0, 1, 2, 3]
    for f in range(4):
        fr = sl[f * 5 : (f + 1) * 5]
        assert got[f]["sq_sum"] == int((fr * fr).sum())
        neg = fr < 0
        assert got[f]["n_crossings"] == int((neg[1:] != neg[:-1]).sum())
