"""Perceptual image hashing: invariances, discrimination, and the
banded near-dup pair search over a Spark relation of rasters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from topic_store_spark.multimodal.phash import phash64, phash_images, phash_pairs


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _smooth_img(rng, h=64, w=64):
    """Low-frequency random image (pure noise has no stable low-band
    structure; real photos do)."""
    small = rng.uniform(0, 200, size=(8, 8))
    ys = (np.arange(h) * 8 // h).astype(int)
    xs = (np.arange(w) * 8 // w).astype(int)
    return small[np.ix_(ys, xs)].astype("uint8")


def test_invariances_and_discrimination(rng):
    base = _smooth_img(rng)
    # brightness shift: AC coefficients untouched -> identical hash
    assert phash64(base) == phash64(np.clip(base.astype(int) + 20, 0, 255).astype("uint8"))
    # upscale (same content, new resolution): small distance
    up = np.kron(base, np.ones((2, 2), dtype="uint8"))
    assert _ham(phash64(base), phash64(up)) <= 6
    # mild noise: small distance
    noisy = np.clip(
        base.astype(int) + rng.integers(-6, 7, size=base.shape), 0, 255
    ).astype("uint8")
    assert _ham(phash64(base), phash64(noisy)) <= 8
    # a different image: far away
    other = _smooth_img(rng)
    assert _ham(phash64(base), phash64(other)) >= 16
    # rgb vs its grayscale content agree
    rgb = np.stack([base, base, base], axis=2)
    assert phash64(rgb) == phash64(base)


def test_phash_pairs_banded_search(spark, rng):
    imgs = []
    for i in range(12):
        base = _smooth_img(rng)
        near = np.clip(
            base.astype(int) + rng.integers(-5, 6, size=base.shape), 0, 255
        ).astype("uint8")
        imgs.append((2 * i, base.tobytes(), 64, 64, "mono8"))
        imgs.append((2 * i + 1, near.tobytes(), 64, 64, "mono8"))
    df = spark.createDataFrame(
        imgs, "img_id long, data binary, height int, width int, encoding string"
    )
    hashed = phash_images(df, data_col="data")
    pairs = phash_pairs(hashed, max_distance=7)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # every planted near-dup pair within guaranteed-recall radius found
    planted = {
        (2 * i, 2 * i + 1)
        for i in range(12)
        if _ham(
            phash64(np.frombuffer(imgs[2 * i][1], "uint8").reshape(64, 64)),
            phash64(np.frombuffer(imgs[2 * i + 1][1], "uint8").reshape(64, 64)),
        )
        <= 7
    }
    assert planted and planted <= got
    # and nothing reported beyond the radius
    hv = {r["img_id"]: r["phash"] for r in hashed.select("img_id", "phash").collect()}
    for a, b in got:
        assert _ham(hv[a], hv[b]) <= 7
