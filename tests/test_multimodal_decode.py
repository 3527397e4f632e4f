"""Tests for the REAL NetPBM decode/resize path (numpy-only parser)
against hand-built P5/P6 images and poison payloads."""

from __future__ import annotations

import hashlib

import numpy as np

from graphsense_blocksci_spark.operators.multimodal import (
    _parse_netpbm,
    decode_image,
    resize_netpbm,
)


def _p6(w: int, h: int, pix: bytes, comment: bool = False) -> bytes:
    hdr = b"P6\n" + (b"# a comment\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    return hdr + pix


def test_parse_netpbm_p6_and_p5():
    pix = bytes(range(4 * 3 * 3))  # 4x3 RGB gradient
    got = _parse_netpbm(_p6(4, 3, pix, comment=True))
    assert got is not None
    w, h, c, arr = got
    assert (w, h, c) == (4, 3, 3)
    assert arr.shape == (3, 4, 3) and arr.tobytes() == pix
    # P5 grayscale
    g = b"P5\n5 2\n255\n" + bytes(range(10))
    w, h, c, arr = _parse_netpbm(g)
    assert (w, h, c) == (5, 2, 1) and arr.tobytes() == bytes(range(10))


def test_parse_netpbm_rejects_poison():
    assert _parse_netpbm(b"") is None
    assert _parse_netpbm(b"JFIF....") is None
    assert _parse_netpbm(b"P6\n4 3\n255\n" + b"\x00" * 5) is None  # truncated
    assert _parse_netpbm(b"P6\n4 3\n65535\n" + b"\x00" * 36) is None  # 2-byte
    assert _parse_netpbm(b"P6\n-1 3\n255\n") is None


def test_decode_image_stats_and_poison(spark):
    pix = bytes(range(4 * 3 * 3))
    rows = [
        (1, bytearray(_p6(4, 3, pix))),
        (2, bytearray(b"not an image")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_image(df).collect()}
    assert got[1]["decode_ok"] and got[1]["px_sum"] == sum(pix)
    assert got[1]["n_pixels"] == 36
    assert got[1]["px_mean"] == sum(pix) / 36
    assert not got[2]["decode_ok"] and got[2]["px_sum"] is None
    assert not got[3]["decode_ok"]


def test_resize_netpbm_nearest_neighbor(spark):
    # 4x4 grayscale, downsample to 2x2: nearest-neighbor picks rows/cols 0,2
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = b"P5\n4 4\n255\n" + arr.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    [row] = resize_netpbm(df, width=2, height=2).collect()
    expect = arr[[0, 2]][:, [0, 2]][:, :, None]  # channel axis retained
    assert row["decode_ok"]
    assert row["px_sum"] == int(expect.sum())
    assert row["thumb_md5"] == hashlib.md5(expect.tobytes()).hexdigest()


def test_image_dhash_parity_and_poison(spark):
    from graphsense_blocksci_spark.operators.multimodal import image_dhash

    # 18x16 grayscale with a deterministic non-trivial pattern,
    # resized to 9x8 for the standard 8x8-bit hash
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(16, 18), dtype=np.uint8)
    payload = b"P5\n18 16\n255\n" + arr.tobytes()
    # P6 twin: per-pixel RGB whose channel sum equals a known gray
    rgb = np.repeat(arr[:, :, None], 3, axis=2).astype(np.uint8)
    p6 = b"P6\n18 16\n255\n" + rgb.tobytes()
    rows = [
        (1, bytearray(payload)),
        (2, bytearray(p6)),
        (3, bytearray(b"poison")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in image_dhash(df, 8, 8).collect()}

    def ref_dhash(gray: np.ndarray, hw: int, hh: int) -> int:
        h, w = gray.shape
        yi = (np.arange(hh) * h) // hh
        xi = (np.arange(hw + 1) * w) // (hw + 1)
        g = gray[yi][:, xi].astype(np.int64)
        bits = g[:, :-1] > g[:, 1:]
        out = 0
        for r in range(hh):
            for c in range(hw):
                if bits[r, c]:
                    out += 1 << (r * hw + c)
        # pack to signed int64 like numpy does
        return int(np.int64(np.uint64(out)))

    assert got[1]["decode_ok"]
    assert got[1]["dhash"] == ref_dhash(arr.astype(np.int64), 8, 8)
    # P6 gray = channel sum = 3x the P5 gray: same comparisons, same hash
    assert got[2]["dhash"] == got[1]["dhash"]
    assert not got[3]["decode_ok"] and got[3]["dhash"] is None
    assert not got[4]["decode_ok"]


def test_image_dhash_shift_invariance(spark):
    from graphsense_blocksci_spark.operators.multimodal import image_dhash

    # dHash is invariant to uniform brightness shift (gradient signs
    # unchanged) — the property that makes it a perceptual hash
    rng = np.random.default_rng(12)
    arr = rng.integers(0, 200, size=(16, 18), dtype=np.uint8)
    rows = [
        (1, bytearray(b"P5\n18 16\n255\n" + arr.tobytes())),
        (2, bytearray(b"P5\n18 16\n255\n" + (arr + 40).tobytes())),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df, 7, 8).collect()}
    assert got[1] == got[2]
