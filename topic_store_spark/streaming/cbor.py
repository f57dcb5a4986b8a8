"""Minimal CBOR codec (RFC 8949 subset) for rosbridge binary framing.

rosbridge negotiates ``"compression": "cbor"`` per subscription and then
ships publish ops as CBOR maps in binary websocket frames — the standard
transport for binary-heavy topics (images, pointclouds), since base64-in-
JSON inflates payloads ~33%.  No third-party CBOR package is assumed:
this is a from-scratch implementation of exactly the subset rosbridge
emits, raising on anything outside it (wrong data silently decoded would
be worse than a loud NotImplementedError).

Decoder coverage: unsigned/negative integers, byte/text strings
(definite and indefinite), arrays, maps, floats (half/single/double),
simple values (false/true/null/undefined), and the RFC 8746 typed-array
tags (64-87) rosbridge uses for numeric message fields — decoded to
plain Python lists.  Other tags decode transparently to their inner
value (standard "ignore unknown tag" behavior).

The encoder covers the mirror subset (ints, bytes, str, list/tuple,
dict, bool, None, float) — enough for scripted fake-server tests and
symmetric tooling.
"""

from __future__ import annotations

import struct
from typing import Any

_BREAK = object()

#: RFC 8746 typed arrays: tag -> (struct format char, little_endian)
_TYPED_ARRAYS: dict[int, tuple[str, bool]] = {
    64: ("B", False),  # uint8
    65: ("H", False), 66: ("I", False), 67: ("Q", False),   # uint be
    68: ("B", True),   # uint8 clamped (same layout)
    69: ("H", True), 70: ("I", True), 71: ("Q", True),      # uint le
    72: ("b", False),  # sint8
    73: ("h", False), 74: ("i", False), 75: ("q", False),   # sint be
    76: ("b", True),
    77: ("h", True), 78: ("i", True), 79: ("q", True),      # sint le
    80: ("e", False), 81: ("f", False), 82: ("d", False),   # float be
    84: ("e", True), 85: ("f", True), 86: ("d", True),      # float le
}


def _read(data: bytes, pos: int, n: int) -> tuple[bytes, int]:
    if pos + n > len(data):
        raise ValueError("CBOR: truncated input")
    return data[pos : pos + n], pos + n


def _argument(data: bytes, pos: int, ai: int) -> tuple[int | None, int]:
    if ai < 24:
        return ai, pos
    if ai == 24:
        b, pos = _read(data, pos, 1)
        return b[0], pos
    if ai == 25:
        b, pos = _read(data, pos, 2)
        return int.from_bytes(b, "big"), pos
    if ai == 26:
        b, pos = _read(data, pos, 4)
        return int.from_bytes(b, "big"), pos
    if ai == 27:
        b, pos = _read(data, pos, 8)
        return int.from_bytes(b, "big"), pos
    if ai == 31:
        return None, pos  # indefinite length
    raise ValueError(f"CBOR: reserved additional info {ai}")


def _decode_chunked(data: bytes, pos: int, major: int) -> tuple[bytes, int]:
    """Indefinite-length byte/text string: definite chunks until break."""
    parts = []
    while True:
        ib, pos = _read(data, pos, 1)
        if ib[0] == 0xFF:
            return b"".join(parts), pos
        mt, ai = ib[0] >> 5, ib[0] & 0x1F
        if mt != major or ai == 31:
            raise ValueError("CBOR: bad chunk in indefinite string")
        n, pos = _argument(data, pos, ai)
        chunk, pos = _read(data, pos, n)
        parts.append(chunk)


def _decode_item(data: bytes, pos: int) -> tuple[Any, int]:
    ib, pos = _read(data, pos, 1)
    ib = ib[0]
    if ib == 0xFF:
        return _BREAK, pos
    major, ai = ib >> 5, ib & 0x1F
    if major == 7:
        # simple values / floats: the "argument" bytes ARE the payload
        if ai == 20:
            return False, pos
        if ai == 21:
            return True, pos
        if ai in (22, 23):  # null / undefined
            return None, pos
        if ai == 25:
            b, pos = _read(data, pos, 2)
            return struct.unpack(">e", b)[0], pos
        if ai == 26:
            b, pos = _read(data, pos, 4)
            return struct.unpack(">f", b)[0], pos
        if ai == 27:
            b, pos = _read(data, pos, 8)
            return struct.unpack(">d", b)[0], pos
        raise NotImplementedError(f"CBOR: simple value {ai} not supported")

    arg, pos = _argument(data, pos, ai)

    if major == 0:
        return arg, pos
    if major == 1:
        return -1 - arg, pos
    if major == 2:
        if arg is None:
            return _decode_chunked(data, pos, 2)
        b, pos = _read(data, pos, arg)
        return b, pos
    if major == 3:
        if arg is None:
            raw, pos = _decode_chunked(data, pos, 3)
        else:
            raw, pos = _read(data, pos, arg)
        return raw.decode("utf-8"), pos
    if major == 4:
        items = []
        if arg is None:
            while True:
                v, pos = _decode_item(data, pos)
                if v is _BREAK:
                    return items, pos
                items.append(v)
        for _ in range(arg):
            v, pos = _decode_item(data, pos)
            items.append(v)
        return items, pos
    if major == 5:
        out: dict = {}
        if arg is None:
            while True:
                k, pos = _decode_item(data, pos)
                if k is _BREAK:
                    return out, pos
                v, pos = _decode_item(data, pos)
                out[k] = v
        for _ in range(arg):
            k, pos = _decode_item(data, pos)
            v, pos = _decode_item(data, pos)
            out[k] = v
        return out, pos
    if major == 6:
        if arg in _TYPED_ARRAYS:
            payload, pos = _decode_item(data, pos)
            if not isinstance(payload, bytes):
                raise ValueError("CBOR: typed array tag without byte string")
            fmt, le = _TYPED_ARRAYS[arg]
            size = struct.calcsize(fmt)
            if len(payload) % size:
                raise ValueError("CBOR: typed array length not a multiple")
            endian = "<" if le else ">"
            return list(
                struct.unpack(f"{endian}{len(payload) // size}{fmt}", payload)
            ), pos
    # unknown tag: decode and surface the inner value
    inner, pos = _decode_item(data, pos)
    return inner, pos


def loads(data: bytes) -> Any:
    """Decode one CBOR item; trailing bytes are an error (a rosbridge
    frame is exactly one op map)."""
    value, pos = _decode_item(bytes(data), 0)
    if value is _BREAK:
        raise ValueError("CBOR: unexpected break code")
    if pos != len(data):
        raise ValueError(f"CBOR: {len(data) - pos} trailing bytes")
    return value


def _encode_head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    for ai, size in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if arg < 1 << (8 * size):
            return bytes([(major << 5) | ai]) + arg.to_bytes(size, "big")
    raise ValueError("CBOR: integer too large")


def dumps(obj: Any) -> bytes:
    """Encode the mirror subset (canonical definite lengths)."""
    if obj is False:
        return b"\xf4"
    if obj is True:
        return b"\xf5"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        if obj >= 0:
            return _encode_head(0, obj)
        return _encode_head(1, -1 - obj)
    if isinstance(obj, float):
        return b"\xfb" + struct.pack(">d", obj)
    if isinstance(obj, bytes):
        return _encode_head(2, len(obj)) + obj
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        return _encode_head(3, len(raw)) + raw
    if isinstance(obj, (list, tuple)):
        return _encode_head(4, len(obj)) + b"".join(dumps(v) for v in obj)
    if isinstance(obj, dict):
        return _encode_head(5, len(obj)) + b"".join(
            dumps(k) + dumps(v) for k, v in obj.items()
        )
    raise NotImplementedError(f"CBOR encode: {type(obj).__name__}")
