"""Pure-Python AVI (RIFF) video container codec — DIB and Motion-JPEG.

Real *video* decode, two tiers: 24-bit uncompressed DIB (``BI_RGB``)
frames, and — since round 7 — **MJPEG** (``MJPG`` fourcc), where every
``00dc`` chunk is a complete baseline JFIF image decoded through the
real entropy decoder in ``jpeg.py`` (Huffman + dequant + IDCT).  The
RIFF plumbing (LIST trees, ``avih``/``strh``/``strf`` headers, ``movi``
frame chunks, ``idx1`` index) is fully parseable with the stdlib, like
the WAV/BMP/PNG/GIF codecs in this package (``codecs.py``, ``gif.py``).
Inter-frame codecs (H.264/VP9 in mp4/webm) remain explicitly out of
scope — they need motion compensation and entropy decoders far beyond
stdlib scope — and raise ``NotImplementedError`` so callers can't
silently get fake pixels.

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


def make_avi(
    frames: "np.ndarray | list[np.ndarray]",
    fps: int = 10,
    *,
    codec: str = "DIB",
    quality: int = 100,
    subsample: bool = False,
) -> bytes:
    """Encode RGB uint8 frames (h, w, 3) into a spec-complete AVI file:
    RIFF + hdrl (avih, strl{strh 'vids', strf BITMAPINFOHEADER}) + movi
    + idx1.

    ``codec="DIB"`` (default) writes uncompressed bottom-up BGR ``00db``
    chunks; ``codec="MJPG"`` writes Motion-JPEG — each frame is a full
    baseline JFIF image (the real entropy-coded encoder in ``jpeg.py``)
    in a ``00dc`` chunk, with ``strh`` handler / ``strf`` biCompression
    set to the ``MJPG`` fourcc.  MJPEG is the classic intra-only video
    codec (every frame independently decodable — exactly why it
    parallelizes per-frame in a Spark pipeline)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    stride = _pad_row(w)
    codec = codec.upper()
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"codec must be DIB or MJPG, got {codec!r}")
    mjpg = codec == "MJPG"
    if mjpg:
        from smartpy_arc_spark.multimodal.jpeg import make_jpeg

        encoded = [
            make_jpeg(fr, quality=quality, subsample=subsample)
            for fr in frames
        ]
        size_image = max(len(e) for e in encoded)
    else:
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
    handler = b"MJPG" if mjpg else b"DIB "
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", handler, 0, 0, 0, 0,
        1, fps,                    # dwScale, dwRate → fps = rate/scale
        0, len(frames), size_image,
        0xFFFFFFFF,                # dwQuality (-1 = default)
        0, 0, 0, w, h,             # dwSampleSize, rcFrame
    )
    # biCompression: BI_RGB (0) or the 'MJPG' fourcc as a little-endian
    # uint32 — the field parse_avi sniffs to pick the frame decoder
    bi_compression = struct.unpack("<I", b"MJPG")[0] if mjpg else 0
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, bi_compression, size_image, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_frames, idx_entries, offset = [], [], 4  # offset from 'movi' fourcc
    frame_fcc = b"00dc" if mjpg else b"00db"
    for i, fr in enumerate(frames):
        if mjpg:
            payload = encoded[i]
        else:
            bgr = fr[::-1, :, ::-1]                # bottom-up, BGR
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            payload = rows.tobytes()
        movi_frames.append(chunk(frame_fcc, payload))
        idx_entries.append(struct.pack("<4sIII", frame_fcc, 0x10, offset, len(payload)))
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
                _, w, h, _, bits, comp = struct.unpack_from(
                    "<IiiHHI", payload, p
                )
                fourcc_str = (
                    "DIB" if comp == 0
                    else struct.pack("<I", comp).decode("ascii", "replace")
                )
                info.update(
                    width=w, height=abs(h), bits=bits, topdown=h < 0,
                    compression=fourcc_str,
                )

    scan(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    return info


def parse_avi(payload: bytes) -> tuple[list[np.ndarray], dict]:
    """Decode every ``00db``/``00dc`` movi chunk into an RGB uint8 frame
    (h, w, 3).

    Codec dispatch is on ``strf`` biCompression: ``BI_RGB`` (0) decodes
    raw bottom-up BGR DIB rows; ``MJPG`` decodes each chunk as a full
    baseline JFIF image through the real entropy decoder
    (``jpeg.parse_jpeg`` — Huffman + dequant + IDCT).  Any other fourcc
    (inter-frame codecs like H.264/VP9 that need full motion
    compensation, genuinely out of scope for a stdlib decoder) raises
    ``NotImplementedError`` so callers can't silently get fake pixels."""
    info = avi_info(payload)
    comp = info.get("compression", "DIB")
    if comp == "MJPG":
        from smartpy_arc_spark.multimodal.jpeg import parse_jpeg
    elif comp != "DIB" or info.get("bits") != 24:
        raise NotImplementedError(
            f"only BI_RGB 24-bit DIB or MJPG AVI supported, got "
            f"{comp!r}/{info.get('bits')}-bit"
        )
    w, h = info["width"], info["height"]
    stride = _pad_row(w)
    frames: list[np.ndarray] = []

    def scan(start: int, end: int) -> None:
        for fourcc, ltype, p, sz in _walk(payload, start, end):
            if ltype == b"movi":
                for fcc2, _, p2, sz2 in _walk(payload, p, p + sz):
                    if fcc2[2:] not in (b"db", b"dc"):
                        continue
                    if comp == "MJPG":
                        px = parse_jpeg(payload[p2:p2 + sz2])
                        if px.ndim == 2:
                            px = np.repeat(px[:, :, None], 3, axis=2)
                        frames.append(np.ascontiguousarray(px))
                    elif sz2 >= stride * h:
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
