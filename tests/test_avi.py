"""MJPEG-AVI demux: round-trip through the from-scratch JPEG codec,
1-in-N sampling, the Spark frame-table explode, and the cross-modal
composition with pHash near-dup detection."""

import numpy as np
import pytest

from topic_store_spark.multimodal.avi import (
    decode_avi,
    demux_avi,
    encode_avi_mjpeg,
    video_frame_table,
)


def _frames(n=6, h=48, w=64):
    rng = np.random.default_rng(11)
    small = rng.uniform(30, 220, size=(n, 6, 8))
    ys = (np.arange(h) * 6 // h).astype(int)
    xs = (np.arange(w) * 8 // w).astype(int)
    return [small[i][np.ix_(ys, xs)].astype("uint8") for i in range(n)]


def test_roundtrip_and_sampling():
    frames = _frames()
    blob = encode_avi_mjpeg(frames, fps=5)
    assert len(demux_avi(blob)) == 6
    decoded = decode_avi(blob)
    assert len(decoded) == 6
    for orig, dec in zip(frames, decoded):
        assert dec.shape[:2] == orig.shape[:2]
        # baseline JPEG at q=85 on smooth content: close reconstruction
        assert np.abs(dec.astype(int) - orig.astype(int)).mean() < 8
    assert len(decode_avi(blob, every_n=3)) == 2


def test_rejects_non_avi_and_non_mjpeg():
    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # a frame chunk that is not JPEG must raise, not mis-decode
    import struct

    fake = b"00dc" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    movi = b"LIST" + struct.pack("<I", 4 + len(fake)) + b"movi" + fake
    blob = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    with pytest.raises(NotImplementedError):
        demux_avi(blob)


def test_video_frame_table_feeds_phash(spark):
    from topic_store_spark.multimodal.phash import phash_pairs, phash_images

    frames = _frames(4)
    # two videos: the second is a lightly-noised copy of the first
    rng = np.random.default_rng(5)
    near = [
        np.clip(f.astype(int) + rng.integers(-4, 5, f.shape), 0, 255).astype(
            "uint8"
        )
        for f in frames
    ]
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_avi_mjpeg(frames))),
            (2, bytearray(encode_avi_mjpeg(near))),
        ],
        "video_id long, data binary",
    )
    table = video_frame_table(df, every_n=2)
    rows = table.collect()
    assert len(rows) == 4  # 2 videos x 2 sampled frames
    assert {(r["video_id"], r["frame_idx"]) for r in rows} == {
        (1, 0), (1, 2), (2, 0), (2, 2),
    }
    # cross-modal composition: near-dup FRAME pairs across videos
    keyed = table.selectExpr(
        "video_id * 100 + frame_idx AS img_id",
        "data", "height", "width", "encoding",
    )
    pairs = phash_pairs(phash_images(keyed), max_distance=7)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # same frame index across the two videos should collide
    assert (100, 200) in got or (102, 202) in got
