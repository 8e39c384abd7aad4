"""GIF87a/89a codec in pure Python + numpy: real LZW, palettes, frames.

Completes the stdlib-only image codec family (BMP, PNG, JPEG): variable-
width LZW decompression with dictionary growth and clear codes, global
and local color tables, interlaced scan-line reordering, multi-frame
(animation) containers, and an encoder whose output any viewer opens —
so the bytes on the wire are genuine GIF, not a stub.

Reference scope: arcpy delegates raster IO (no decode semantics to
match); part of the multimodal-column extension surface (SURVEY.md §7).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# LZW


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Variable-width LZW per the GIF spec (LSB-first bit packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code]:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError(f"bad LZW code {code}")
            if prev is not None and not table[-1]:
                # (never reached: append above always fills) — guard slot
                pass
            out.extend(entry)
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real LZW with dictionary growth; resets at the 4096 ceiling."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    cur: tuple[int, ...] = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        cur = (px,)
    if cur:
        emit(table[cur], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def make_gif(frames: np.ndarray | list[np.ndarray]) -> bytes:
    """Encode (H, W, 3) uint8 RGB frame(s) — ≤256 distinct colors total —
    as GIF89a (multi-frame containers get a 10 cs/frame animation loop)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w, _ = frames[0].shape
    colors: list[tuple[int, int, int]] = []
    index_of: dict[tuple[int, int, int], int] = {}
    idx_frames = []
    for fr in frames:
        flat = fr.reshape(-1, 3)
        idx = np.empty(len(flat), dtype=np.int32)
        for i, px in enumerate(map(tuple, flat)):
            j = index_of.get(px)
            if j is None:
                j = index_of[px] = len(colors)
                colors.append(px)
            idx[i] = j
        idx_frames.append(idx)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; GIF caps at 256")
    bits = max(2, (len(colors) - 1).bit_length())
    table_size = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    for c in colors:
        out += bytes(c)
    out += b"\x00\x00\x00" * (table_size - len(colors))
    if len(frames) > 1:  # NETSCAPE loop + per-frame delay
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in idx_frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 10 cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = max(2, bits)
        out.append(min_code)
        payload = _lzw_encode([int(v) for v in idx], min_code)
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def parse_gif(payload: bytes) -> list[np.ndarray]:
    """Decode all frames → list of (H, W, 3) uint8 RGB arrays."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at {pos}")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(bytes(data), min_code), dtype=np.int64)[
            : fw * fh
        ].reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, fh, step))
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        frame = np.zeros((h, w, 3), dtype=np.uint8)
        if ct is None:
            raise ValueError("GIF frame without a color table")
        frame[fy : fy + fh, fx : fx + fw] = ct[idx]
        frames.append(frame)
    return frames
