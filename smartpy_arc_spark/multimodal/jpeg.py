"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure Python + numpy.

Replaces the former deterministic-fake JPEG stub in
``multimodal/binary.py``: a real entropy-coded DCT codec — standard
Annex K quantization + Huffman tables, zigzag run-length coding, byte
stuffing, restart-marker handling, 4:4:4 and 4:2:0 chroma layouts —
implemented with the stdlib and numpy only (the sandbox has no image
libraries; the point is that the bytes on the wire are genuine JPEG).

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components, any
sampling factors up to 2×2, custom DQT/DHT from the stream, DRI/RSTn
restarts.  Encoder: SOF0, 4:4:4 or 4:2:0, quality-scaled Annex K
tables; its output decodes in any standard viewer.

Determinism contract (what the SQL oracle mirrors): all decoder
rounding is ``floor(x + 0.5)`` (half-up) and the YCbCr↔RGB conversions
use the exact JFIF constants, so for quality-100 constant-color images
the decoded RGB is a closed-form integer function of the input color.

Reference scope: arcpy delegates all raster IO (no public decode
semantics to match); this is part of the multimodal-column extension
surface (SURVEY.md §7).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K — public specification values)

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: ``coef = C @ block @ C.T``."""
    c = np.zeros((8, 8))
    for u in range(8):
        scale = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = scale * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_DCT = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (quality 100 → all 1s,
    which makes DC-only blocks decode exactly)."""
    q = max(1, min(100, quality))
    s = 5000 // q if q < 50 else 200 - 2 * q
    def scale(tbl):
        return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int64)
    return scale(STD_LUMA_Q), scale(STD_CHROMA_Q)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF forward conversion, half-up rounding, clipped to [0, 255]."""
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(
        _round_half_up(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.uint8)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF inverse conversion, half-up rounding, clipped to [0, 255]."""
    y = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = y + 1.402 * crf
    g = y - 0.344136 * cbf - 0.714136 * crf
    b = y + 1.772 * cbf
    return np.clip(
        _round_half_up(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Huffman coding


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, canonical code assignment (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, code_length)."""
    return {v: (c, l) for (l, c), v in _build_decode_table(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Bit reader over unstuffed scan bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError("jpeg scan data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid jpeg huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map ``size`` magnitude bits to a signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encoder


def make_jpeg(
    pixels: np.ndarray, *, quality: int = 90, subsample: bool = False
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline JFIF.

    ``subsample=True`` writes 4:2:0 (2×2-averaged chroma); default 4:4:4.
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    lq, cq = quality_tables(quality)
    lq8, cq8 = lq.reshape(8, 8), cq.reshape(8, 8)
    ycc = rgb_to_ycbcr(pixels)
    planes = [ycc[..., 0].astype(np.float64)]
    if subsample:
        # pad to even dims, then 2×2 mean with half-up rounding
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        for c in (1, 2):
            p = np.pad(
                ycc[..., c].astype(np.float64),
                ((0, ph - h), (0, pw - w)), mode="edge",
            )
            planes.append(
                _round_half_up(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                    / 4.0
                )
            )
    else:
        planes += [ycc[..., 1].astype(np.float64), ycc[..., 2].astype(np.float64)]

    hmax = 2 if subsample else 1
    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # pad planes to MCU multiples (luma 8*hmax, chroma 8)
    def pad_to(p, mult):
        ph = (p.shape[0] + mult - 1) // mult * mult
        pw = (p.shape[1] + mult - 1) // mult * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")

    planes[0] = pad_to(planes[0], 8 * hmax)
    planes[1] = pad_to(planes[1], 8)
    planes[2] = pad_to(planes[2], 8)

    writer = _BitWriter()
    dc_pred = [0, 0, 0]

    def encode_block(plane, by, bx, qtbl, dc_tab, ac_tab, comp):
        block = plane[by : by + 8, bx : bx + 8] - 128.0
        coef = _DCT @ block @ _DCT.T
        quant = np.rint(coef / qtbl).astype(np.int64)
        zz = quant.flatten()[ZIGZAG]
        diff = int(zz[0]) - dc_pred[comp]
        dc_pred[comp] = int(zz[0])
        size = _category(diff)
        code, length = dc_tab[size]
        writer.write(code, length)
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                if i > last_nz:
                    code, length = ac_tab[0x00]  # EOB
                    writer.write(code, length)
                    break
                run += 1
                if run == 16:
                    code, length = ac_tab[0xF0]  # ZRL
                    writer.write(code, length)
                    run = 0
                continue
            size = _category(v)
            code, length = ac_tab[(run << 4) | size]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0

    mcu_h, mcu_w = 8 * hmax, 8 * hmax
    for my in range(0, planes[0].shape[0], mcu_h):
        for mx in range(0, planes[0].shape[1], mcu_w):
            for vy in range(hmax):
                for vx in range(hmax):
                    encode_block(planes[0], my + 8 * vy, mx + 8 * vx,
                                 lq8, enc_dc[0], enc_ac[0], 0)
            for comp in (1, 2):
                encode_block(planes[comp], my // hmax, mx // hmax,
                             cq8, enc_dc[1], enc_ac[1], comp)
    scan = writer.flush()

    # ---- markers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0: density 1×1, no thumbnail
    for tid, tbl in ((0, lq), (1, cq)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(tbl[ZIGZAG[i]]) for i in range(64))  # zigzag order
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    samp = (hmax << 4) | hmax
    out += bytes([1, samp, 0, 2, 0x11, 1, 3, 0x11, 1])
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS), (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes → (H, W, C) uint8 (C = 1 or 3, RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while payload[pos + 1] == 0xFF:  # optional fill bytes
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals
                qtables[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": height, "w": width, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG frame (SOF{marker & 0xF})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scomp.append({"cs": cs, "td": tabs >> 4, "ta": tabs & 0xF})
            scan_start = pos + seglen
            return _decode_scan(
                payload, scan_start, frame, scomp, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scomp, qtables, htables, restart_interval):
    # unstuff: strip 0x00 after 0xFF; split at RSTn (DC prediction resets)
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # restart marker
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next real marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    by_cs = {c["id"]: c for c in comps}
    order = [by_cs[s["cs"]] for s in scomp]
    for c, s in zip(order, scomp):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["plane"] = np.zeros(
            (mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64
        )

    mcu_index = 0
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    dc_pred = {c["id"]: 0 for c in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                dc_pred = {c["id"]: 0 for c in comps}
            for c in order:
                dc_tab = htables[(0, c["td"])]
                ac_tab = htables[(1, c["ta"])]
                qtbl = qtables[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read_bits(size), size)
                        dc_pred[c["id"]] += diff
                        zz[0] = dc_pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        block = _DCT.T @ (coef.reshape(8, 8) * qtbl) @ _DCT
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_index += 1

    # upsample to full resolution, crop, level-shift, round
    full = []
    for c in order:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(_round_half_up(full[0]), 0, 255).astype(np.uint8)[..., None]
    return ycbcr_to_rgb(
        np.clip(_round_half_up(full[0]), 0, 255),
        np.clip(_round_half_up(full[1]), 0, 255),
        np.clip(_round_half_up(full[2]), 0, 255),
    )
