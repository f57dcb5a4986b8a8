"""MJPEG-in-AVI video demux + frame decode — numpy/stdlib only.

The last media modality: without ffmpeg, arbitrary containers (H.264
MP4 etc.) stay out of scope, but Motion-JPEG inside AVI — the format
robot camera drivers and many capture cards actually emit — is fully
decodable with machinery this repo already has: AVI is a RIFF container
(the same chunk walk as the WAV codec) whose ``movi`` list holds one
complete baseline-JPEG image per ``..dc`` chunk, and
`multimodal/jpeg.py` is a real ITU-T T.81 decoder.

Surface:

- ``demux_avi(data)``       -> list of raw per-frame JPEG payloads;
- ``decode_avi(data, every_n)`` -> list of decoded frame arrays
  (1-in-N sampling BEFORE decode — sampling a 30 fps stream down to
  1 fps skips 29/30 of the DCT work, which is the point of demux-first);
- ``encode_avi_mjpeg(frames, fps)`` -> AVI bytes (test/fixture path,
  like the other encoders);
- ``video_frame_table(df, every_n)`` -> Spark relation: one row per
  SAMPLED frame with the raster bytes + dims, via the standard Arrow
  ``mapInPandas`` batch contract — the exploded frame table downstream
  image ops (pHash dedup, resize, feature extract) consume directly.

Non-MJPEG AVIs raise ``NotImplementedError`` (wrong pixels are worse
than a loud error — the module policy of `multimodal/codecs.py`).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from topic_store_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _walk_riff(body: bytes, want: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (chunk_id, payload) for every chunk directly inside a RIFF
    body, descending into LIST chunks whose type matches ``want`` (or
    any LIST when want is b'')."""
    off = 0
    while off + 8 <= len(body):
        cid = body[off : off + 4]
        (size,) = struct.unpack("<I", body[off + 4 : off + 8])
        payload = body[off + 8 : off + 8 + size]
        if cid == b"LIST":
            ltype = payload[:4]
            if not want or ltype == want or ltype in (b"hdrl", b"movi", b"strl"):
                yield from _walk_riff(payload[4:], want)
        else:
            yield cid, payload
        off += 8 + size + (size & 1)


def demux_avi(data: bytes) -> list[bytes]:
    """Raw JPEG payloads of every video frame chunk (``..dc``/``..db``)
    in stream order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI/RIFF file")
    frames = []
    for cid, payload in _walk_riff(data[12:], b""):
        if cid[2:4] in (b"dc", b"db") and payload:
            if payload[:2] != b"\xff\xd8":
                raise NotImplementedError(
                    "AVI stream is not MJPEG (frame chunk lacks a JPEG SOI)"
                )
            frames.append(payload)
    return frames


def decode_avi(data: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Decoded frame arrays, 1-in-``every_n`` sampled before decode."""
    return [
        decode_jpeg(p) for p in demux_avi(data)[:: max(1, every_n)]
    ]


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Minimal but well-formed MJPEG AVI (hdrl with avih/strh/strf +
    movi) — the fixture/round-trip encoder."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(payloads), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(payloads), 0, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_frame_table(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "video_id",
    every_n: int = 1,
) -> DataFrame:
    """Explode AVI blobs into one row per sampled decoded frame:
    ``(video_id, frame_idx, height, width, channels, encoding, data)``
    — raster bytes in the `binary.ENCODINGS` convention, ready for
    `phash_images` / `resize_images` / `decode_images`."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("encoding", T.StringType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf[id_col], pdf[data_col]):
                if data is None:
                    continue
                for i, payload in enumerate(
                    demux_avi(bytes(data))[:: max(1, every_n)]
                ):
                    arr = decode_jpeg(payload)
                    ch = 1 if arr.ndim == 2 else arr.shape[2]
                    rows.append(
                        {
                            id_col: vid,
                            "frame_idx": i * max(1, every_n),
                            "height": arr.shape[0],
                            "width": arr.shape[1],
                            "channels": ch,
                            "encoding": "mono8" if ch == 1 else "rgb8",
                            "data": arr.astype("uint8").tobytes(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "height", "width", "channels",
                    "encoding", "data",
                ],
            )

    return df.mapInPandas(explode, schema=out_schema)
