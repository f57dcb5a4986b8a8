"""Randomized roundtrip fuzzer for the from-scratch raster/audio
codecs: random image shapes (1-wide/1-tall degenerates included), bit
depths, channel counts, and filter types through PNG encode→decode;
random PCM/float clips through WAV — both must reproduce the source
array EXACTLY (these codecs are lossless by construction; baseline
JPEG's bounded-error contract is covered by test_jpeg.py).  The fixed
parametrized grids live in test_multimodal.py; this harness walks new
shape × content × filter combinations every marathon round.
"""

from __future__ import annotations

import random

import numpy as np


def test_png_wav_roundtrip_random(spark):
    from topic_store_spark.multimodal.codecs import (
        decode_png,
        decode_wav,
        encode_png,
        encode_wav,
    )

    rng = random.Random(0xC0DE)
    npr = np.random.default_rng(rng.getrandbits(32))

    for _ in range(40):
        h, w = rng.choice([(1, 1), (1, 17), (9, 1)]) if rng.random() < 0.2 else (
            rng.randint(2, 24), rng.randint(2, 24)
        )
        channels = rng.choice([None, 2, 3, 4])  # None = 2-D grayscale
        dtype = rng.choice([np.uint8, np.uint16])
        shape = (h, w) if channels is None else (h, w, channels)
        hi = 255 if dtype is np.uint8 else 65535
        arr = npr.integers(0, hi + 1, size=shape).astype(dtype)
        ftype = rng.randint(0, 4)
        out = decode_png(encode_png(arr, filter_type=ftype))
        assert out.dtype == arr.dtype and out.shape == arr.shape, (
            f"shape/dtype: {arr.shape}/{arr.dtype} -> {out.shape}/{out.dtype} "
            f"(filter {ftype})"
        )
        assert np.array_equal(out, arr), f"PNG filter {ftype} shape {shape}"

    for _ in range(30):
        n = rng.choice([0, 1, rng.randint(2, 4000)])
        ch = rng.choice([1, 2])
        dtype = rng.choice([np.int16, np.float32])
        shape = (n,) if ch == 1 else (n, ch)
        if dtype is np.int16:
            clip = npr.integers(-(1 << 15), 1 << 15, size=shape).astype(dtype)
        else:
            clip = (npr.random(size=shape, dtype=np.float32) * 2 - 1).astype(dtype)
        rate = rng.choice([8_000, 16_000, 44_100])
        out = decode_wav(encode_wav(clip, sample_rate=rate))
        want = clip.reshape(-1, 1) if clip.ndim == 1 else clip  # mono contract
        assert out.dtype == want.dtype, (want.dtype, out.dtype)
        assert out.shape == want.shape, (want.shape, out.shape)
        assert np.array_equal(out, want), f"WAV {dtype} shape {shape} rate {rate}"
