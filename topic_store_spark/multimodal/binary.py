"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``BinaryType`` columns with a typed metadata
struct alongside — the same shape the reference stores for
``sensor_msgs/Image`` (raster bytes + height/width/encoding/step
siblings, reference utils.py:18-32 encoding table, FIXTURES.md F2).

The Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` plumbing, partition-size control.  The *codec* step
(actual JPEG/PNG/audio decode) is stubbed behind ``DECODERS`` because no
image/audio library ships in this container — swap in cv2/PIL/ffmpeg
decoders by registering a callable; everything around them is unchanged.

Raw-raster helpers (``decode_images``/``resize_images``) operate on the
reference's uncompressed encodings via numpy only — those are NOT stubs.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: encoding string -> (numpy dtype, channels) — the reference's table
#: (utils.py:18-32), uncompressed rasters only
ENCODINGS: dict[str, tuple[str, int]] = {
    "rgb8": ("uint8", 3), "rgba8": ("uint8", 4), "rgb16": ("uint16", 3),
    "rgba16": ("uint16", 4), "bgr8": ("uint8", 3), "bgra8": ("uint8", 4),
    "bgr16": ("uint16", 3), "bgra16": ("uint16", 4), "mono8": ("uint8", 1),
    "mono16": ("uint16", 1),
    **{f"{b}UC{c}": (f"uint{b}", c) for b in (8, 16) for c in (1, 2, 3, 4)},
    **{f"{b}SC{c}": (f"int{b}", c) for b in (8, 16, 32) for c in (1, 2, 3, 4)},
    **{f"32FC{c}": ("float32", c) for c in (1, 2, 3, 4)},
    **{f"64FC{c}": ("float64", c) for c in (1, 2, 3, 4)},
    "bayer_rggb8": ("uint8", 1), "bayer_bggr8": ("uint8", 1),
    "bayer_gbrg8": ("uint8", 1), "bayer_grbg8": ("uint8", 1),
}

#: pluggable compressed-format decoders: name -> bytes -> np.ndarray.
#: png/wav/jpeg are REAL from-scratch codecs (multimodal/codecs.py,
#: multimodal/jpeg.py — baseline DCT JPEG per ITU-T T.81, numpy only),
#: and MJPEG-in-AVI video is really demuxed + decoded in
#: multimodal/avi.py (its Spark surface is the per-frame explode
#: ``video_frame_table``, not this single-image registry).  Only
#: inter-frame-coded containers (H.264 MP4 etc.) remain a stub — those
#: genuinely need ffmpeg; register a callable in a real deployment and
#: nothing else changes.
from topic_store_spark.multimodal.codecs import decode_png, decode_wav
from topic_store_spark.multimodal.jpeg import decode_jpeg

DECODERS: dict[str, Callable[[bytes], np.ndarray] | None] = {
    "jpeg": decode_jpeg,
    "png": decode_png,
    "wav": decode_wav,
    "mp4_frames": None,
}


def attach_binary_metadata(
    df: DataFrame, binary_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct
    (size/sha/media_type) — the ingest normal form for media columns."""
    b = F.col(binary_col)
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(b).alias("size_bytes"),
            F.sha2(b, 256).alias("sha256"),
        ),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
    ]
)


def _raster(data: bytes, height: int, width: int, encoding: str) -> np.ndarray:
    if encoding not in ENCODINGS:
        raise ValueError(f"unknown encoding {encoding!r}")
    dtype, channels = ENCODINGS[encoding]
    arr = np.frombuffer(data, dtype=dtype)
    shape = (height, width, channels) if channels > 1 else (height, width)
    return arr.reshape(shape)


def decode_images(
    df: DataFrame,
    data_col: str = "data",
    height_col: str = "height",
    width_col: str = "width",
    encoding_col: str = "encoding",
) -> DataFrame:
    """Raw raster bytes -> per-image stats struct via Arrow-batched
    ``mapInPandas``.  Demonstrates the decode pipeline shape: batch in,
    numpy decode per row, typed struct out."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("pixel_stats", _FEATURE_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = []
            for data, h, w, enc in zip(
                pdf[data_col], pdf[height_col], pdf[width_col], pdf[encoding_col]
            ):
                if data is None:
                    stats.append(None)
                    continue
                arr = _raster(bytes(data), int(h), int(w), enc).astype("float64")
                stats.append(
                    {
                        "mean": float(arr.mean()),
                        "std": float(arr.std()),
                        "min": float(arr.min()),
                        "max": float(arr.max()),
                    }
                )
            pdf = pdf.copy()
            pdf["pixel_stats"] = stats
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


extract_image_features = decode_images  # alias: stats ARE the baseline features


def resize_images(
    df: DataFrame,
    out_height: int,
    out_width: int,
    data_col: str = "data",
    height_col: str = "height",
    width_col: str = "width",
    encoding_col: str = "encoding",
) -> DataFrame:
    """Nearest-neighbor resize of raw rasters (numpy-only, no media libs).
    Returns same schema with data/height/width replaced."""
    schema = df.schema

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_data = []
            for data, h, w, enc in zip(
                pdf[data_col], pdf[height_col], pdf[width_col], pdf[encoding_col]
            ):
                if data is None:
                    new_data.append(None)
                    continue
                arr = _raster(bytes(data), int(h), int(w), enc)
                ys = (np.arange(out_height) * h // out_height).astype(int)
                xs = (np.arange(out_width) * w // out_width).astype(int)
                new_data.append(arr[ys][:, xs].tobytes())
            pdf = pdf.copy()
            pdf[data_col] = new_data
            pdf[height_col] = out_height
            pdf[width_col] = out_width
            yield pdf

    return df.mapInPandas(resize, schema=schema)


def frame_sample(
    df: DataFrame,
    every_n: int,
    order_col: str = "frame_idx",
) -> DataFrame:
    """Deterministic 1-in-N frame sampling for video frame tables."""
    return df.filter((F.col(order_col) % every_n) == 0)


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("shape", T.ArrayType(T.IntegerType())),
        T.StructField("dtype", T.StringType()),
    ]
)


def decode_compressed(df: DataFrame, fmt: str, data_col: str = "data") -> DataFrame:
    """Compressed-media decode through a registered ``DECODERS`` entry
    (``bytes -> np.ndarray``; self-describing formats like jpeg/png/wav
    carry their own shape).  The container ships no cv2/PIL/ffmpeg, so
    the media entries are ``None`` stubs — register a real callable and
    this Arrow-batched pipeline is complete: each batch decodes row-wise
    and emits a ``decoded {data, shape, dtype}`` struct alongside."""
    decoder = DECODERS.get(fmt)
    if decoder is None:
        raise NotImplementedError(
            f"no decoder registered for {fmt!r}; register one in "
            "topic_store_spark.multimodal.binary.DECODERS"
        )
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("decoded", _DECODED_SCHEMA)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = []
            for data in pdf[data_col]:
                if data is None:
                    decoded.append(None)
                    continue
                arr = np.asarray(decoder(bytes(data)))
                decoded.append(
                    {
                        "data": arr.tobytes(),
                        "shape": list(arr.shape),
                        "dtype": str(arr.dtype),
                    }
                )
            pdf = pdf.copy()
            pdf["decoded"] = decoded
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# F14: payload compression (parity: reference sanitation.py:32-33
# EXPERIMENTAL_COMPRESSION_ENABLED gating sanitation.py:352-354/368/399
# image<->compressed conversion).  The reference's codec is cv2 JPEG; here
# the default is stdlib zlib — genuinely lossless, deterministic, and
# available everywhere — applied executor-side over Arrow batches.  The
# flag ships False exactly like the reference's.
# ---------------------------------------------------------------------------

EXPERIMENTAL_COMPRESSION_ENABLED = False  # reference sanitation.py:32-33


def _codec_schema(df: DataFrame, codec_col: str) -> T.StructType:
    fields = list(df.schema.fields)
    if codec_col not in df.columns:
        fields.append(T.StructField(codec_col, T.StringType()))
    return T.StructType(fields)


def compress_rasters(
    df: DataFrame, data_col: str = "data", codec_col: str = "codec", level: int = 6
) -> DataFrame:
    """Lossless zlib compression of binary payloads; stamps ``codec_col``
    = 'zlib'.  Raster metadata (height/width/encoding) stays in its own
    columns, so decompression needs nothing beyond the row itself."""
    import zlib

    schema = _codec_schema(df, codec_col)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[data_col] = [
                None if d is None else zlib.compress(bytes(d), level)
                for d in pdf[data_col]
            ]
            pdf[codec_col] = "zlib"
            yield pdf[names]

    return df.mapInPandas(run, schema=schema)


def decompress_rasters(
    df: DataFrame, data_col: str = "data", codec_col: str = "codec"
) -> DataFrame:
    """Inverse of ``compress_rasters``: rows stamped 'zlib' are restored
    bit-exactly; other rows pass through untouched."""
    import zlib

    schema = _codec_schema(df, codec_col)
    names = [f.name for f in schema.fields]
    has_codec = codec_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if not has_codec:
                pdf[codec_col] = None
            pdf[data_col] = [
                zlib.decompress(bytes(d))
                if d is not None and codec == "zlib"
                else d
                for d, codec in zip(pdf[data_col], pdf[codec_col])
            ]
            pdf[codec_col] = [
                "raw" if c == "zlib" else c for c in pdf[codec_col]
            ]
            yield pdf[names]

    return df.mapInPandas(run, schema=schema)
