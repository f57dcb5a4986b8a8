"""Multimodal binary-column plumbing (decode stubbed; Spark-side real)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from topic_store_spark.multimodal import (
    attach_binary_metadata,
    decode_images,
    frame_sample,
    resize_images,
)
from topic_store_spark.multimodal.binary import ENCODINGS, decode_compressed


@pytest.fixture(scope="module")
def image_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i, enc in enumerate(["rgb8", "mono16", "32FC1"]):
        dtype, ch = ENCODINGS[enc]
        arr = (rng.random((8, 6, ch)) * 100).astype(dtype).squeeze()
        rows.append((i, 8, 6, enc, bytearray(arr.tobytes())))
    return spark.createDataFrame(
        rows, "img_id long, height long, width long, encoding string, data binary"
    )


def test_attach_binary_metadata(image_df):
    out = attach_binary_metadata(image_df, "data").collect()
    for r in out:
        assert r["data_meta"]["media_type"] == "image"
        assert r["data_meta"]["size_bytes"] == len(r["data"])
        assert len(r["data_meta"]["sha256"]) == 64


def test_decode_images_stats(image_df):
    out = decode_images(image_df).collect()
    for r in out:
        dtype, ch = ENCODINGS[r["encoding"]]
        arr = np.frombuffer(bytes(r["data"]), dtype=dtype).astype("float64")
        stats = r["pixel_stats"]
        assert stats["mean"] == pytest.approx(arr.mean())
        assert stats["min"] == arr.min() and stats["max"] == arr.max()


def test_resize_images_roundtrip(image_df):
    out = resize_images(image_df, 4, 3).collect()
    for r in out:
        dtype, ch = ENCODINGS[r["encoding"]]
        itemsize = np.dtype(dtype).itemsize
        assert r["height"] == 4 and r["width"] == 3
        assert len(r["data"]) == 4 * 3 * ch * itemsize


def test_frame_sample(spark):
    df = spark.createDataFrame([(i,) for i in range(30)], ["frame_idx"])
    assert frame_sample(df, 10).count() == 3


def test_compressed_decode_is_stubbed(image_df):
    with pytest.raises(NotImplementedError):
        decode_compressed(image_df, "jpeg")


def test_full_encoding_table_roundtrip(spark):
    # parity: the reference's ~40-encoding sweep (test_database_storage.py:49-75)
    rng = np.random.default_rng(11)
    rows = []
    for i, (enc, (dtype, ch)) in enumerate(sorted(ENCODINGS.items())):
        arr = (rng.random((5, 4, ch)) * 50).astype(dtype).squeeze()
        rows.append((i, 5, 4, enc, bytearray(arr.tobytes()), arr.tobytes()))
    df = spark.createDataFrame(
        rows,
        "img_id long, height long, width long, encoding string, data binary, orig binary",
    )
    out = decode_images(df).select("img_id", "encoding", "data", "orig").collect()
    assert len(out) == len(ENCODINGS)
    for r in out:
        assert bytes(r["data"]) == bytes(r["orig"])  # byte-exact round trip


def test_decode_compressed_with_registered_decoder(image_df):
    """The decode pipeline is complete: registering a real decoder (here
    zlib-of-raw-bytes standing in for a media codec) yields a decoded
    {data, shape, dtype} struct per row."""
    import zlib

    from topic_store_spark.multimodal.binary import (
        DECODERS,
        compress_rasters,
        decode_compressed,
    )

    DECODERS["zraw8"] = lambda b: np.frombuffer(zlib.decompress(b), np.uint8)
    try:
        packed = compress_rasters(image_df.filter("encoding = 'rgb8'"))
        out = decode_compressed(packed, "zraw8").collect()
        assert len(out) == 1
        row = out[0]
        assert row["decoded"]["dtype"] == "uint8"
        assert row["decoded"]["shape"] == [8 * 6 * 3]
        orig = image_df.filter("encoding = 'rgb8'").first()["data"]
        assert bytes(row["decoded"]["data"]) == bytes(orig)
    finally:
        DECODERS.pop("zraw8", None)


def test_compress_decompress_rasters_roundtrip(image_df):
    """F14 (reference sanitation.py:32-33 gated compression): zlib
    payload compression round-trips bit-exactly; non-zlib rows pass
    through decompression untouched."""
    from topic_store_spark.multimodal.binary import (
        EXPERIMENTAL_COMPRESSION_ENABLED,
        compress_rasters,
        decompress_rasters,
    )

    assert EXPERIMENTAL_COMPRESSION_ENABLED is False  # ships off, like ref

    packed = compress_rasters(image_df)
    assert set(r["codec"] for r in packed.select("codec").collect()) == {"zlib"}
    restored = decompress_rasters(packed).collect()
    orig = {r["img_id"]: bytes(r["data"]) for r in image_df.collect()}
    for r in restored:
        assert bytes(r["data"]) == orig[r["img_id"]]
        assert r["codec"] == "raw"
    # pass-through: decompress on uncompressed input leaves data alone
    untouched = decompress_rasters(image_df).collect()
    for r in untouched:
        assert bytes(r["data"]) == orig[r["img_id"]]
