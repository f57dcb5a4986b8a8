"""Baseline JPEG codec — pure numpy + stdlib, no cv2/PIL.

Closes the reference's compressed-image flow (reference utils.py:18-32
encoding table, sanitation.py:352-354 cv2 imencode/imdecode) for the one
format that had remained a stub: baseline DCT JPEG (SOF0/SOF1, huffman,
8-bit).  Everything here is from the public ITU-T T.81 spec:

- quantization + huffman tables are the spec's own Annex K examples
  (the tables virtually every encoder ships);
- encoder: JFIF YCbCr (or grayscale), 4:4:4 (no subsampling), level
  shift, 8x8 orthonormal DCT via one matrix sandwich ``T @ B @ T.T``
  over all blocks at once, quality-scaled quantization (libjpeg's
  5000/q // 200-2q formula), DC-differential + run-length/size huffman
  entropy coding with byte stuffing;
- decoder: marker parse (DQT 8/16-bit, DHT, SOF0/SOF1, SOS, DRI),
  generic component sampling factors (4:4:4, 4:2:2, 4:2:0, ...),
  restart-marker handling, huffman + EXTEND, dequantize, inverse
  zigzag, IDCT, nearest-neighbor chroma upsample, JFIF YCbCr -> RGB.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` — a wrong pixel is worse than a loud error.
Lossy round-trip accuracy is validated in tests (exact on flat blocks,
bounded error on smooth gradients).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits-per-length[1..16], symbol values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: coeffs = _T @ block @ _T.T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction (C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol (decoder-side view of the same codes)."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUM, _QUANT_CHROM):
        t = np.clip((base * scale + 50) // 100, 1, 255)
        out.append(t.astype(np.int32))
    return out[0], out[1]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8), row-major block order, edge-padded."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_plane(
    writer: _BitWriter,
    coeffs: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-code quantized zigzag coefficients (n_blocks, 64)."""
    for row in coeffs:
        diff = int(row[0]) - pred
        pred = int(row[0])
        size = _category(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            writer.write(_amplitude(diff, size), size)
        nz = np.nonzero(row[1:])[0]
        prev = 0
        for i in nz:
            run = int(i) - prev
            prev = int(i) + 1
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            v = int(row[1 + i])
            size = _category(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(_amplitude(v, size), size)
        if prev != 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def encode_jpeg(
    arr: np.ndarray, quality: int = 75, restart_interval: int = 0
) -> bytes:
    """uint8 ``(h, w)`` grayscale or ``(h, w, 3)`` RGB -> baseline JFIF
    JPEG bytes (4:4:4, Annex K huffman tables).  ``restart_interval``
    emits DRI + RSTn markers every N MCUs (resync points real camera
    streams use; also exercises the decoder's restart path)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
    else:
        raise ValueError("encode_jpeg expects (h, w) or (h, w, 3)")
    h, w = arr.shape[:2]
    qlum, qchrom = _quality_tables(quality)
    qts = [qlum] + ([qchrom] if len(planes) == 3 else [])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in qt[_ZIGZAG])
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if ncomp == 3:
        tables += [(0x01, _DC_CHROM), (0x11, _AC_CHROM)]
    for tc_th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tc_th]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(ncomp):
        out += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    dc_lum = _canonical_codes(*_DC_LUM)
    ac_lum = _canonical_codes(*_AC_LUM)
    dc_chrom = _canonical_codes(*_DC_CHROM)
    ac_chrom = _canonical_codes(*_AC_CHROM)
    # 4:4:4 non-interleaved-equivalent MCU order: one block per component
    # per MCU, components interleaved block-by-block
    quantized = []
    for cid, plane in enumerate(planes):
        blocks = _blocks(plane) - 128.0
        coeffs = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
        qt = qts[0 if cid == 0 else 1].reshape(8, 8)
        q = np.round(coeffs / qt).astype(np.int64)
        quantized.append(q.reshape(-1, 64)[:, _ZIGZAG])
    preds = [0] * ncomp
    rst = 0
    for b in range(quantized[0].shape[0]):
        if restart_interval and b and b % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * ncomp
        for cid in range(ncomp):
            dc = dc_lum if cid == 0 else dc_chrom
            ac = ac_lum if cid == 0 else ac_chrom
            preds[cid] = _encode_plane(
                writer, quantized[cid][b : b + 1], dc, ac, preds[cid]
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG: truncated entropy data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                self.marker = nxt
                byte = 0  # segment over; feed zeros (spec behavior)
                self.pos -= 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int:
        """Byte-align and consume the next marker (for RSTn)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                self.marker = None
                return m
            self.pos += 1
        raise ValueError("JPEG: expected restart marker")


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array ``(h, w)`` (grayscale) or
    ``(h, w, 3)`` RGB.  Raises NotImplementedError on progressive /
    arithmetic / 12-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZIGZAG] = vals
                qtables[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _decode_table(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both baseline huffman)
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG: {precision}-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            for c in range(ncomp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F, "tq": tq}
                )
        elif marker == 0xC2:
            raise NotImplementedError("JPEG: progressive (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG: SOF{marker - 0xC0} not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["dc"] = tables >> 4
                        comp["ac"] = tables & 0x0F
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_pos is None or not comps:
        raise ValueError("JPEG: no scan found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        c["pred"] = 0

    reader = _BitReader(data, scan_pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("JPEG: bad restart marker")
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_tab = htables[(0, c["dc"])]
                ac_tab = htables[(1, c["ac"])]
                qt = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.bits(size), size) if size else 0
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("JPEG: bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        block = (zz[_UNZIGZAG].reshape(8, 8) * qt).astype(np.float64)
                        pixels = _T.T @ block @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["coef"][y0 : y0 + 8, x0 : x0 + 8] = pixels
            mcu_count += 1

    planes = []
    for c in comps:
        plane = c["coef"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
