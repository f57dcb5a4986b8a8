"""Dependency-free media codecs for the ``DECODERS`` registry.

The container ships no cv2/PIL/ffmpeg, but two of the reference's media
formats are fully decodable with the standard library alone:

- **PNG** (reference sanitation.py image payloads): zlib inflate +
  per-scanline unfiltering per the PNG spec — bit depths 8/16, color
  types gray / gray+alpha / RGB / RGBA / palette, all five filters.
  Interlaced (Adam7) images raise — they do not appear in robot-sensor
  pipelines and a partial decode would be worse than a loud error.
- **WAV/RIFF** (audio payloads): direct RIFF chunk walk supporting PCM
  8/16/32-bit and IEEE float32/64, returned as ``(frames, channels)``.

Baseline JPEG is implemented from the ITU-T T.81 spec in the sibling
``multimodal/jpeg.py`` (huffman + DCT, numpy only).  Video remains the
one registry stub: frame demuxing without ffmpeg is out of scope, and a
wrong pixel is worse than ``NotImplementedError``.

These run row-wise inside Arrow-batched ``mapInPandas``
(binary.decode_compressed) — correctness-first reference codecs; a real
deployment with cv2/PIL installed registers those instead and nothing
else changes.

Encoders (``encode_png`` / ``encode_wav``) exist so tests and fixture
generation can round-trip payloads deterministically; ``encode_png``
can emit any filter type to exercise every decoder path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9): each scanline is one
    filter-type byte + ``stride`` filtered bytes."""
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev_base = base - stride
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[prev_base + x] if y else 0
                out[base + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev_base + x] if y else 0
                out[base + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - bpp] if x >= bpp else 0
                up = out[prev_base + x] if y else 0
                ul = out[prev_base + x - bpp] if (y and x >= bpp) else 0
                out[base + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> ``(H, W)`` or ``(H, W, C)`` uint8/uint16 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    palette: bytes | None = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("PNG: Adam7 interlace not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unknown color type {color}")
    if depth not in (8, 16) and not (color == 3 and depth in (1, 2, 4, 8)):
        raise NotImplementedError(f"PNG: bit depth {depth} not supported")
    if color == 3 and depth != 8:
        raise NotImplementedError("PNG: sub-byte palette depths not supported")

    channels = _PNG_CHANNELS[color]
    sample_bytes = depth // 8
    bpp = max(1, channels * sample_bytes)
    stride = width * channels * sample_bytes
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: IDAT length mismatch")
    flat = _unfilter(raw, height, stride, bpp)

    dtype = np.dtype(">u2") if depth == 16 else np.dtype("u1")
    arr = np.frombuffer(bytes(flat), dtype=dtype).reshape(height, width, channels)
    if depth == 16:
        arr = arr.astype("uint16")  # native byte order out
    if color == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        lut = np.frombuffer(palette, dtype="u1").reshape(-1, 3)
        arr = lut[arr[:, :, 0]]
    elif channels == 1:
        arr = arr[:, :, 0]
    return arr


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Array -> PNG bytes (gray / gray+alpha / RGB / RGBA, uint8/uint16).
    ``filter_type`` applies one filter to every scanline — exists so
    tests can exercise each decode path."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if arr.dtype == np.uint8:
        depth, payload = 8, arr
    elif arr.dtype == np.uint16:
        depth, payload = 16, arr.astype(">u2")
    else:
        raise ValueError(f"PNG encode: unsupported dtype {arr.dtype}")
    bpp = channels * (depth // 8)
    rows = payload.reshape(height, width * channels).view("u1").reshape(height, -1)

    scanlines = bytearray()
    prev = np.zeros(rows.shape[1], dtype="u1")
    for y in range(height):
        cur = rows[y]
        scanlines.append(filter_type)
        if filter_type == 0:
            scanlines += cur.tobytes()
        else:
            line = bytearray()
            for x in range(len(cur)):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                orig = int(cur[x])
                if filter_type == 1:
                    line.append((orig - left) & 0xFF)
                elif filter_type == 2:
                    line.append((orig - up) & 0xFF)
                elif filter_type == 3:
                    line.append((orig - ((left + up) >> 1)) & 0xFF)
                elif filter_type == 4:
                    line.append((orig - _paeth(left, up, ul)) & 0xFF)
                else:
                    raise ValueError(f"PNG encode: filter {filter_type}")
            scanlines += line
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV / RIFF
# ---------------------------------------------------------------------------

_WAV_PCM, _WAV_FLOAT, _WAV_EXTENSIBLE = 1, 3, 0xFFFE


def decode_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> ``(frames, channels)`` array (PCM u8/i16/i32,
    float32/float64); direct RIFF walk, no ``wave``-module PCM-only
    restriction."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    fmt = None
    fmt_body = b""
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            frames = body
    if fmt is None or frames is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, channels, _rate, _byte_rate, _block, bits = fmt
    if audio_format == _WAV_EXTENSIBLE:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag is the SubFormat
        # GUID's leading u16 at fmt-body offset 24 (after cbSize at 16-18
        # and the 6-byte extension prefix). Refuse to guess if absent.
        if len(fmt_body) >= 26:
            audio_format = struct.unpack("<H", fmt_body[24:26])[0]
        else:
            raise NotImplementedError(
                "WAV: WAVE_FORMAT_EXTENSIBLE without a SubFormat extension"
            )
    if audio_format == _WAV_PCM:
        dtype = {8: "u1", 16: "<i2", 32: "<i4"}.get(bits)
        if dtype is None:
            raise NotImplementedError(f"WAV: {bits}-bit PCM not supported")
    elif audio_format == _WAV_FLOAT:
        dtype = {32: "<f4", 64: "<f8"}[bits]
    else:
        raise NotImplementedError(f"WAV: format tag {audio_format}")
    arr = np.frombuffer(frames, dtype=dtype)
    n = (len(arr) // channels) * channels
    return arr[:n].reshape(-1, channels)


def encode_wav(arr: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """``(frames, channels)`` array -> WAV bytes (dtype picks the format:
    uint8/int16/int32 -> PCM, float32/float64 -> IEEE float).  A 1-D
    array is a MONO clip -> ``(n, 1)``: the previous ``atleast_2d``
    coercion read it as ONE frame of n channels, silently writing an
    n-channel file (caught by tests/test_codec_roundtrip_fuzz.py).
    A 0-D scalar is a single mono frame -> ``(1, 1)`` (the pre-r10
    ``atleast_2d`` behavior, restored per r10 ADVICE)."""
    arr = np.asarray(arr)
    if arr.ndim == 0:
        arr = arr.reshape(1, 1)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2:
        raise ValueError("WAV encode: expected (frames, channels)")
    tag = {
        np.dtype("uint8"): (_WAV_PCM, 8),
        np.dtype("int16"): (_WAV_PCM, 16),
        np.dtype("int32"): (_WAV_PCM, 32),
        np.dtype("float32"): (_WAV_FLOAT, 32),
        np.dtype("float64"): (_WAV_FLOAT, 64),
    }.get(arr.dtype)
    if tag is None:
        raise ValueError(f"WAV encode: unsupported dtype {arr.dtype}")
    audio_format, bits = tag
    channels = arr.shape[1]
    block = channels * bits // 8
    payload = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, sample_rate,
        sample_rate * block, block, bits,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
