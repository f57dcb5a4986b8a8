"""Baseline JPEG codec (multimodal/jpeg.py): lossy roundtrip bounds,
marker handling, restart markers, and the Spark decode path."""

from __future__ import annotations

import numpy as np
import pytest

from topic_store_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return (128 + 40 * np.sin(y / 6) + 40 * np.cos(x / 5)).astype(np.uint8)


def test_flat_blocks_roundtrip_exactly():
    for v in (0, 128, 255):
        img = np.full((24, 24), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=75))
        np.testing.assert_array_equal(out, img)


def test_gray_gradient_bounded_error_odd_size():
    img = _gradient(33, 21)  # forces edge padding in both axes
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_rgb_roundtrip_bounded_error():
    g = _gradient(40, 40)
    rgb = np.stack([g, 255 - g, np.roll(g, 7, axis=0)], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 3.0
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 20


def test_quality_monotonicity():
    img = _gradient(48, 48)
    errs, sizes = [], []
    for q in (95, 50, 10):
        enc = encode_jpeg(img, quality=q)
        sizes.append(len(enc))
        errs.append(np.abs(decode_jpeg(enc).astype(int) - img.astype(int)).mean())
    assert sizes[0] > sizes[2]          # lower quality -> smaller file
    assert errs[0] < errs[2]            # ... and larger error


def test_restart_markers_roundtrip():
    img = _gradient(32, 64)  # 4x8 = 32 MCUs
    enc = encode_jpeg(img, quality=85, restart_interval=3)
    assert b"\xff\xdd" in enc           # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    out = decode_jpeg(enc)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 5


def test_unsupported_variants_raise():
    enc = bytearray(encode_jpeg(_gradient(16, 16)))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2                   # masquerade as progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        encode_jpeg(_gradient(8, 8).astype(np.float32))


def test_spark_decode_compressed_jpeg(spark):
    """The Arrow mapInPandas decode path with the real JPEG codec."""
    from topic_store_spark.multimodal.binary import decode_compressed

    img = _gradient(16, 24)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, quality=90)))], "img_id long, data binary"
    )
    row = decode_compressed(df, "jpeg").first()
    arr = np.frombuffer(bytes(row["decoded"]["data"]), dtype="uint8").reshape(
        row["decoded"]["shape"]
    )
    assert arr.shape == (16, 24)
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 4
