"""Pure-Python AVI (RIFF) video container codec — uncompressed DIB frames.

Closes the last honest multimodal stub: real *video* decode.  AVI with
24-bit uncompressed DIB (``BI_RGB``) frames is a genuine video container
format (RIFF lists, ``avih``/``strh``/``strf`` headers, ``movi`` frame
chunks, ``idx1`` index) that is fully parseable with the stdlib, like the
WAV/BMP/PNG/GIF codecs in this package (``codecs.py``, ``gif.py``).
Compressed codecs (H.264/VP9 in mp4/webm) remain explicitly out of scope —
they need entropy decoders far beyond stdlib scope — and raise
``NotImplementedError`` in ``binary.py``; this module is the real path for
the uncompressed tier.

Format notes (public spec: MSDN "AVI RIFF File Reference"):

- little-endian RIFF: ``RIFF <sz> AVI `` containing ``LIST hdrl``
  (``avih`` main header + one ``LIST strl`` per stream with ``strh`` +
  ``strf``), ``LIST movi`` (frame chunks ``00db`` = uncompressed DIB for
  stream 0), and an ``idx1`` seek index.
- frame pixels use the BMP convention: bottom-up row order, BGR byte
  order, each row zero-padded to a 4-byte boundary.

Reference parity: the reference repo has no multimodal surface at all —
this is part of the LLM-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["make_avi", "parse_avi", "avi_info"]


def _pad_row(w: int) -> int:
    return (w * 3 + 3) & ~3


def make_avi(frames: "np.ndarray | list[np.ndarray]", fps: int = 10) -> bytes:
    """Encode RGB uint8 frames (h, w, 3) into a spec-complete AVI file:
    RIFF + hdrl (avih, strl{strh 'vids'/'DIB ', strf BITMAPINFOHEADER})
    + movi ('00db' uncompressed bottom-up BGR) + idx1."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stride = _pad_row(w)
    size_image = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        data = struct.pack("<4sI", fourcc, len(payload)) + payload
        if len(payload) % 2:
            data += b"\x00"  # RIFF chunks are word-aligned
        return data

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        size_image * fps,          # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        len(frames), 0, 1,         # totalframes, initialframes, streams
        size_image,                # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,          # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,                    # dwScale, dwRate → fps = rate/scale
        0, len(frames), size_image,
        0xFFFFFFFF,                # dwQuality (-1 = default)
        0, 0, 0, w, h,             # dwSampleSize, rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_frames, idx_entries, offset = [], [], 4  # offset from 'movi' fourcc
    for fr in frames:
        bgr = fr[::-1, :, ::-1]                    # bottom-up, BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        payload = rows.tobytes()
        movi_frames.append(chunk(b"00db", payload))
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, offset, len(payload)))
        offset += 8 + len(payload) + (len(payload) % 2)
    movi = lst(b"movi", b"".join(movi_frames))
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, payload_size)."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", buf, pos)
        payload = pos + 8
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, buf[payload:payload + 4], payload + 4, size - 4
        else:
            yield fourcc, None, payload, size
        pos = payload + size + (size % 2)


def avi_info(payload: bytes) -> dict:
    """Parse headers only: width/height/bit depth/frame count/fps."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    info: dict = {}

    def scan(start: int, end: int) -> None:
        for fourcc, ltype, p, sz in _walk(payload, start, end):
            if ltype is not None:
                scan(p, p + sz)
            elif fourcc == b"avih":
                (uspf, _, _, _, total) = struct.unpack_from("<5I", payload, p)
                info["n_frames"] = total
                info["usec_per_frame"] = uspf
            elif fourcc == b"strh":
                ftype, _, _, _, _, _, scale, rate = struct.unpack_from("<4s4sIHHIII", payload, p)
                if ftype == b"vids" and scale:
                    info["fps"] = rate // scale
            elif fourcc == b"strf" and "width" not in info:
                _, w, h, _, bits = struct.unpack_from("<IiiHH", payload, p)
                info.update(width=w, height=abs(h), bits=bits, topdown=h < 0)

    scan(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    return info


def parse_avi(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode every ``00db``/``00dc`` movi chunk into an RGB uint8 frame
    (h, w, 3).  Only BI_RGB 24-bit DIB frames are supported — anything
    else (a compressed fourcc) raises ``NotImplementedError`` so callers
    can't silently get fake pixels."""
    info = avi_info(payload)
    if info.get("bits") != 24:
        raise NotImplementedError(f"only 24-bit DIB AVI supported, got {info.get('bits')}-bit")
    w, h = info["width"], info["height"]
    stride = _pad_row(w)
    frames: list[np.ndarray] = []

    def scan(start: int, end: int) -> None:
        for fourcc, ltype, p, sz in _walk(payload, start, end):
            if ltype == b"movi":
                for fcc2, _, p2, sz2 in _walk(payload, p, p + sz):
                    if fcc2[2:] in (b"db", b"dc") and sz2 >= stride * h:
                        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=p2)
                        bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                        rgb = bgr[:, :, ::-1]
                        if not info.get("topdown"):
                            rgb = rgb[::-1]
                        frames.append(np.ascontiguousarray(rgb))
            elif ltype is not None:
                scan(p, p + sz)

    scan(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    return frames, info
