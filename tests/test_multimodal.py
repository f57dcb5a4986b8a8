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
    # video frame demux is the one remaining stub (needs ffmpeg)
    with pytest.raises(NotImplementedError):
        decode_compressed(image_df, "mp4_frames")


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


# ---------------------------------------------------------------------------
# Real stdlib codecs (multimodal/codecs.py): PNG + WAV upgrade F14 from
# stub to working decode; JPEG/video stay NotImplementedError by design.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape,dtype",
    [((5, 7), "uint8"), ((5, 7, 3), "uint8"), ((4, 3, 4), "uint8"),
     ((5, 7), "uint16"), ((3, 2, 3), "uint16"), ((6, 2, 2), "uint8")],
)
def test_png_roundtrip_all_filters(shape, dtype, filter_type):
    from topic_store_spark.multimodal.codecs import decode_png, encode_png

    rng = np.random.default_rng(hash((shape, dtype, filter_type)) % 2**31)
    arr = (rng.random(shape) * np.iinfo(dtype).max).astype(dtype)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype


def test_png_palette_and_errors():
    import struct
    import zlib

    from topic_store_spark.multimodal.codecs import decode_png, encode_png

    # hand-build a 2x2 palette image: indices [[0,1],[1,0]]
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    raw = bytes([0, 0, 1, 0, 1, 0])  # filter0 + row, filter0 + row
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(png)
    np.testing.assert_array_equal(
        out, np.array([[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]], "uint8")
    )
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # interlace flag -> loud refusal, not a wrong image
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png_i = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_i)
             + chunk(b"IDAT", zlib.compress(bytes(6))) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(png_i)
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2), dtype="float32"))


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32", "float32", "float64"])
def test_wav_roundtrip_formats(dtype):
    from topic_store_spark.multimodal.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(42)
    if dtype.startswith("float"):
        arr = (rng.random((100, 2)) * 2 - 1).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, (100, 2)).astype(dtype)
    out = decode_wav(encode_wav(arr, sample_rate=8000))
    np.testing.assert_array_equal(out, arr)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def _extensible_wav(payload: bytes, channels: int, bits: int, sub_tag: int | None) -> bytes:
    """Hand-build a WAVE_FORMAT_EXTENSIBLE file (fmt tag 0xFFFE with the
    real format in the SubFormat GUID) — numpy/struct only."""
    import struct

    if sub_tag is None:
        ext = b""  # truncated: no cbSize/extension at all
    else:
        # 16-byte SubFormat GUID; only the leading u16 tag is semantic
        guid = struct.pack("<H", sub_tag) + b"\x00" * 14
        ext = struct.pack("<HHI", 22, bits, 0x3) + guid
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 0xFFFE, channels, 8000, 8000 * block, block, bits) + ext
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_wav_extensible_reads_subformat_tag():
    """WAVE_FORMAT_EXTENSIBLE: the real tag lives in the SubFormat GUID —
    a float32 extensible file must decode as float, not be guessed as
    int32 from its bit depth; a truncated extension must raise."""
    from topic_store_spark.multimodal.codecs import decode_wav

    arr = (np.arange(64, dtype="float32") / 64.0).reshape(-1, 2)
    out = decode_wav(_extensible_wav(arr.tobytes(), 2, 32, sub_tag=3))
    np.testing.assert_array_equal(out, arr)

    ints = np.arange(64, dtype="int32").reshape(-1, 2)
    out = decode_wav(_extensible_wav(ints.tobytes(), 2, 32, sub_tag=1))
    np.testing.assert_array_equal(out, ints)

    with pytest.raises(NotImplementedError):
        decode_wav(_extensible_wav(arr.tobytes(), 2, 32, sub_tag=None))


def test_decode_compressed_png_wav_via_spark(spark):
    """The mapInPandas decode path with the REAL codecs: payload bytes ->
    decoded {data, shape, dtype} struct, exact pixels/samples back."""
    from topic_store_spark.multimodal.codecs import (
        decode_png, encode_png, encode_wav,
    )

    rng = np.random.default_rng(3)
    imgs = [(i, bytearray(encode_png((rng.random((4, 5, 3)) * 255).astype("uint8"),
                                     filter_type=i % 5))) for i in range(6)]
    df = spark.createDataFrame(imgs, "media_id long, data binary")
    rows = decode_compressed(df, "png").orderBy("media_id").collect()
    assert len(rows) == 6
    for r in rows:
        d = r["decoded"]
        assert d["shape"] == [4, 5, 3] and d["dtype"] == "uint8"
        np.testing.assert_array_equal(
            np.frombuffer(bytes(d["data"]), "uint8").reshape(4, 5, 3),
            decode_png(bytes(r["data"])),
        )

    wavs = [(0, bytearray(encode_wav(np.arange(64, dtype="int16").reshape(-1, 2))))]
    wdf = spark.createDataFrame(wavs, "media_id long, data binary")
    wrow = decode_compressed(wdf, "wav").first()["decoded"]
    assert wrow["shape"] == [32, 2] and wrow["dtype"] == "int16"
