"""Differential fuzzer for the from-scratch CBOR codec (RFC 8949
subset, `streaming/cbor.py`):

1. encode/decode ROUNDTRIP over random values of the mirror subset
   (boundary integers at every argument-width cliff, unicode text,
   nested arrays/maps);
2. an INDEPENDENT test-side serializer emits wire forms the encoder
   never produces — oversized argument widths, indefinite-length
   strings/arrays/maps with random chunking, half/single floats,
   RFC 8746 typed arrays in every tag the decoder claims, unknown
   tags — with the expected value derived from the generation
   structure, never from the codec;
3. every strict prefix class of a valid encoding must raise loudly
   (truncation can never decode silently), and trailing bytes are an
   error.
"""

from __future__ import annotations

import random
import struct

_INT_CLIFFS = [0, 1, 23, 24, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**64 - 1]


def _head(major: int, arg: int, rng: random.Random) -> bytes:
    """Encode a head with a RANDOM legal width (canonical or wider)."""
    widths = [w for w, size in ((24, 1), (25, 2), (26, 4), (27, 8)) if arg < 1 << (8 * size)]
    if arg < 24 and rng.random() < 0.5:
        return bytes([(major << 5) | arg])
    ai = rng.choice(widths)
    size = {24: 1, 25: 2, 26: 4, 27: 8}[ai]
    return bytes([(major << 5) | ai]) + arg.to_bytes(size, "big")


def _chunked(major: int, raw: bytes, rng: random.Random) -> bytes:
    out = bytearray([(major << 5) | 31])
    i = 0
    while i < len(raw):
        j = min(len(raw), i + rng.randint(1, 5))
        out += _head(major, j - i, rng) + raw[i:j]
        i = j
    return bytes(out + b"\xff")


def _gen(rng: random.Random, depth: int) -> tuple[bytes, object]:
    """(wire bytes, expected decoded value) — expectation from structure."""
    choices = ["int", "neg", "bytes", "str", "f16", "f32", "f64", "bool",
               "null", "undef", "typed", "tag"]
    if depth < 3:
        choices += ["arr", "arr_indef", "map", "map_indef"] * 2
    kind = rng.choice(choices)
    if kind == "int":
        v = rng.choice(_INT_CLIFFS + [rng.randint(0, 2**40)])
        return _head(0, v, rng), v
    if kind == "neg":
        v = rng.choice(_INT_CLIFFS[:-1] + [rng.randint(0, 2**40)])
        return _head(1, v, rng), -1 - v
    if kind == "bytes":
        raw = bytes(rng.randrange(256) for _ in range(rng.randint(0, 12)))
        if rng.random() < 0.4:
            return _chunked(2, raw, rng), raw
        return _head(2, len(raw), rng) + raw, raw
    if kind == "str":
        s = "".join(rng.choice("aβ统🜁 x") for _ in range(rng.randint(0, 8)))
        raw = s.encode("utf-8")
        if rng.random() < 0.4:
            # chunk boundaries must not split multibyte sequences: chunk
            # over CHARACTERS, re-encode each piece
            out = bytearray(b"\x7f")
            i = 0
            while i < len(s):
                j = min(len(s), i + rng.randint(1, 3))
                piece = s[i:j].encode("utf-8")
                out += _head(3, len(piece), rng) + piece
                i = j
            return bytes(out + b"\xff"), s
        return _head(3, len(raw), rng) + raw, s
    if kind == "f16":
        v = struct.unpack(">e", struct.pack(">e", rng.choice([0.5, -2.25, 1.0, 65504.0, 0.0])))[0]
        return b"\xf9" + struct.pack(">e", v), v
    if kind == "f32":
        v = struct.unpack(">f", struct.pack(">f", rng.uniform(-100, 100)))[0]
        return b"\xfa" + struct.pack(">f", v), v
    if kind == "f64":
        v = rng.uniform(-1e9, 1e9)
        return b"\xfb" + struct.pack(">d", v), v
    if kind == "bool":
        v = rng.random() < 0.5
        return (b"\xf5" if v else b"\xf4"), v
    if kind == "null":
        return b"\xf6", None
    if kind == "undef":
        return b"\xf7", None
    if kind == "typed":
        from topic_store_spark.streaming.cbor import _TYPED_ARRAYS

        tag = rng.choice(sorted(_TYPED_ARRAYS))
        fmt, le = _TYPED_ARRAYS[tag]
        n = rng.randint(0, 6)
        if fmt in "efd":
            vals = [
                struct.unpack(f">{fmt}", struct.pack(f">{fmt}", rng.uniform(-50, 50)))[0]
                for _ in range(n)
            ]
        else:
            lo, hi = (0, (1 << (8 * struct.calcsize(fmt))) - 1)
            if fmt.islower():  # signed
                half = 1 << (8 * struct.calcsize(fmt) - 1)
                lo, hi = -half, half - 1
            vals = [rng.randint(lo, hi) for _ in range(n)]
        endian = "<" if le else ">"
        payload = struct.pack(f"{endian}{n}{fmt}", *vals)
        return _head(6, tag, rng) + _head(2, len(payload), rng) + payload, list(vals)
    if kind == "tag":  # unknown tag decodes transparently
        inner, want = _gen(rng, depth + 1)
        return _head(6, rng.choice([1, 1000, 55799]), rng) + inner, want
    if kind in ("arr", "arr_indef"):
        n = rng.randint(0, 4)
        parts, wants = [], []
        for _ in range(n):
            b, w = _gen(rng, depth + 1)
            parts.append(b)
            wants.append(w)
        if kind == "arr_indef":
            return b"\x9f" + b"".join(parts) + b"\xff", wants
        return _head(4, n, rng) + b"".join(parts), wants
    # map / map_indef: unique scalar keys
    n = rng.randint(0, 4)
    keys = rng.sample([f"k{i}" for i in range(10)] + list(range(100, 110)), n)
    parts, want = [], {}
    for k in keys:
        kb = (
            _head(0, k, rng)
            if isinstance(k, int)
            else _head(3, len(k.encode()), rng) + k.encode()
        )
        vb, vw = _gen(rng, depth + 1)
        parts.append(kb + vb)
        want[k] = vw
    if kind == "map_indef":
        return b"\xbf" + b"".join(parts) + b"\xff", want
    return _head(5, n, rng) + b"".join(parts), want


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (a != a and b != b) or a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    return type(a) is type(b) and a == b


def test_cbor_matches_reference(spark):
    from topic_store_spark.streaming import cbor

    rng = random.Random(0xCB0A)

    # 1. roundtrip over the mirror subset
    def rt_value(depth: int):
        kind = rng.choice(
            ["int", "float", "bytes", "str", "bool", "none"]
            + (["list", "dict"] * 2 if depth < 3 else [])
        )
        if kind == "int":
            s = rng.choice(_INT_CLIFFS)
            return rng.choice([s, -s - 1, rng.randint(-(2**40), 2**40)])
        if kind == "float":
            return rng.uniform(-1e12, 1e12)
        if kind == "bytes":
            return bytes(rng.randrange(256) for _ in range(rng.randint(0, 10)))
        if kind == "str":
            return "".join(rng.choice("aβ统🜁-7 ") for _ in range(rng.randint(0, 10)))
        if kind == "bool":
            return rng.random() < 0.5
        if kind == "none":
            return None
        if kind == "list":
            return [rt_value(depth + 1) for _ in range(rng.randint(0, 4))]
        return {f"k{i}": rt_value(depth + 1) for i in range(rng.randint(0, 4))}

    for _ in range(120):
        v = rt_value(0)
        assert _eq(cbor.loads(cbor.dumps(v)), v), f"roundtrip diverged: {v!r}"

    # 2. independent serializer, non-canonical wire forms
    for i in range(150):
        wire, want = _gen(rng, 0)
        got = cbor.loads(wire)
        assert _eq(got, want), (
            f"case {i}: wire={wire.hex()} got={got!r} want={want!r}"
        )

    # 3. truncation always raises; trailing bytes are an error
    for _ in range(80):
        wire, _w = _gen(rng, 0)
        if len(wire) > 1:
            cut = rng.randrange(1, len(wire))
            try:
                cbor.loads(wire[:cut])
                raise AssertionError(
                    f"truncated decode succeeded: {wire.hex()} cut={cut}"
                )
            except (ValueError, NotImplementedError):
                pass
        try:
            cbor.loads(wire + b"\x00")
            raise AssertionError("trailing byte accepted")
        except (ValueError, NotImplementedError):
            pass
