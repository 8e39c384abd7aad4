"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata — the pattern
for 100 TB multimodal training pipelines: Spark moves bytes + metadata,
per-item decode happens in Arrow-batched Python workers near the data,
never on the driver.

Decode is REAL for every container with a pure-Python codec in this repo —
JPEG (``jpeg.py``: Huffman+IDCT), PNG/BMP/WAV (``codecs.py``), GIF
animations (``gif.py``: LZW) — selected by magic-byte sniffing under
``stub=False``.  Each operator also keeps a ``stub=True`` arithmetic fake
whose output an external oracle can recompute from payload bytes alone
(the cross-engine-checkable mode the driver's oracle queries use).  The
only genuinely out-of-scope decode is real video (mp4/webm — needs
ffmpeg, absent here); ``frame_sample`` documents that boundary and
handles animated GIF as the real moving-image path.  Learned-model
embedding extraction (CLIP/ResNet) is likewise out of scope — the real
path of ``extract_features`` computes CLASSICAL decode-based features
with the same schema a model would produce.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "item_id long, n_bytes int, width int, height int, format string"
)

FRAME_SCHEMA = "item_id long, frame_idx int, frame bytes_not_supported"  # doc only


def attach_payload(df: DataFrame, src_col: str, payload_col: str = "payload") -> DataFrame:
    """Pack a column's UTF-8 bytes as the opaque media payload (the
    testdata has no real media; callers with real files use
    ``spark.read.format('binaryFile')`` which yields the same shape)."""
    return df.withColumn(payload_col, F.col(src_col).cast("binary"))


def _stub_image_meta(item_id: int, payload: bytes) -> tuple:
    """Deterministic fake decode: dimensions derived from payload length so
    an external oracle can recompute them arithmetically."""
    n = len(payload)
    width = n % 640
    height = (n * 7) % 480
    fmt = "png" if n % 2 == 0 else "jpeg"
    return (item_id, n, width, height, fmt)


def decode_image_meta(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    stub: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Per-item image decode → metadata rows via ``mapInPandas``.

    The iterator-of-batches shape is the real contract: each Arrow batch is
    decoded in-place on the executor, output schema is fixed
    (``IMAGE_META_SCHEMA``), null payloads pass through as null metadata.

    ``stub=False`` runs the REAL pure-Python decoders (``codecs.py`` /
    ``jpeg.py``): the container format is sniffed from magic bytes —
    JPEG (``FF D8``), PNG, BMP — and width/height come from an actual
    decode.  Unrecognized payloads yield ``format=NULL`` with null
    dimensions rather than an error (corpus-scale decode must not die on
    one bad file).  ``stub=True`` keeps the arithmetic fake whose output
    an external oracle can recompute from the payload length alone.
    """
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)

    def real_meta(item_id: int, payload: bytes) -> tuple:
        from smartpy_arc_spark.multimodal.codecs import parse_bmp, parse_png
        from smartpy_arc_spark.multimodal.jpeg import parse_jpeg

        try:
            if payload[:2] == b"\xff\xd8":
                img = parse_jpeg(payload)
                return (item_id, len(payload), img.shape[1], img.shape[0], "jpeg")
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                img = parse_png(payload)
                return (item_id, len(payload), img.shape[1], img.shape[0], "png")
            if payload[:2] == b"BM":
                img = parse_bmp(payload)
                return (item_id, len(payload), img.shape[1], img.shape[0], "bmp")
            if payload[:4] == b"GIF8":
                from smartpy_arc_spark.multimodal.gif import parse_gif

                img = parse_gif(payload)[0]
                return (item_id, len(payload), img.shape[1], img.shape[0], "gif")
        except Exception:
            pass  # corrupt container: report unknown, keep the row
        return (item_id, len(payload), None, None, None)

    def decode(batches):
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    out.append((item_id, None, None, None, None))
                elif stub:
                    out.append(_stub_image_meta(int(item_id), bytes(payload)))
                else:
                    out.append(real_meta(int(item_id), bytes(payload)))
            yield pd.DataFrame(
                out, columns=["item_id", "n_bytes", "width", "height", "format"]
            )

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_META_SCHEMA)


def frame_sample(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    stub: bool = True,
) -> DataFrame:
    """Moving-image frame sampling: ``n_frames`` evenly-spaced frames per
    item, one input row → n output rows, all executor-side.

    ``stub=False`` (the real path): animated-GIF payloads decode with the
    pure-Python LZW codec (``multimodal/gif.py``), AVI video payloads with
    the pure-Python RIFF/DIB codec (``multimodal/avi.py``), and the
    sampled frames re-encode as single-frame lossless PNG; compressed
    containers (mp4/webm) would need ffmpeg, which is absent — those
    payloads are skipped.
    ``stub=True`` keeps the byte-slice fake whose output an arithmetic
    oracle can recompute."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)

    def sample(batches):
        from smartpy_arc_spark.multimodal.codecs import make_png
        from smartpy_arc_spark.multimodal.gif import parse_gif

        for pdf in batches:
            ids, idxs, frames, hashes = [], [], [], []

            def push(item_id, i, chunk):
                ids.append(int(item_id))
                idxs.append(i)
                frames.append(chunk)
                hashes.append(hashlib.md5(chunk).hexdigest())

            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if stub:
                    step = max(len(b) // n_frames, 1)
                    for i in range(n_frames):
                        push(item_id, i, b[i * step : (i + 1) * step] or b[-1:])
                elif b[:4] == b"GIF8" or (b[:4] == b"RIFF" and b[8:12] == b"AVI "):
                    try:
                        if b[:4] == b"GIF8":
                            decoded = parse_gif(b)
                        else:
                            from smartpy_arc_spark.multimodal.avi import parse_avi

                            decoded, _ = parse_avi(b)
                    except Exception:
                        continue
                    k = len(decoded)
                    picks = sorted({i * k // n_frames for i in range(min(n_frames, k))})
                    for i, fi in enumerate(picks):
                        push(item_id, i, make_png(decoded[fi]))
            yield pd.DataFrame(
                {"item_id": ids, "frame_idx": idxs, "frame": frames,
                 "frame_md5": hashes}
            )

    return df.select(id_col, payload_col).mapInPandas(
        sample, "item_id long, frame_idx int, frame binary, frame_md5 string"
    )


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    dim: int = 8,
    normalize: bool = False,
    stub: bool = True,
) -> DataFrame:
    """Embedding extraction stub: payload → fixed-``dim`` float vector via
    ``mapInPandas`` (``array<float>`` output, the shape a CLIP/ResNet
    encoder produces; feeds the similarity/ANN operators directly).

    The ``stub=True`` fake is arithmetic on payload length — ``v_j =
    ((n·P_j + Q_j) mod 1000) / 1000`` — so an external oracle can
    recompute it.  ``stub=False`` computes REAL classical features from an
    actual decode (magic-sniffed JPEG/PNG/BMP/GIF via the pure-Python
    codecs): normalized channel means/stds, aspect ratio, and coarse
    2×2-region luminances, tiled/truncated to ``dim`` — the schema and
    batch shape are exactly what a learned encoder would produce, so the
    similarity/ANN operators downstream are agnostic to which ran.
    Neural-model (CLIP/ResNet) extraction itself is out of scope here (no
    model runtime in this container); corpus-TRAINED text embeddings are
    real and live in ``operators/lsa.py`` (distributed LSA).
    Unrecognized payloads yield null vectors.
    """
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)

    def real_features(b: bytes):
        import numpy as np

        from smartpy_arc_spark.multimodal.codecs import parse_bmp, parse_png
        from smartpy_arc_spark.multimodal.gif import parse_gif
        from smartpy_arc_spark.multimodal.jpeg import parse_jpeg

        try:
            if b[:2] == b"\xff\xd8":
                img = parse_jpeg(b)
            elif b[:8] == b"\x89PNG\r\n\x1a\n":
                img = parse_png(b)
            elif b[:2] == b"BM":
                img = parse_bmp(b)
            elif b[:4] == b"GIF8":
                img = parse_gif(b)[0]
            else:
                return None
        except Exception:
            return None
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        f = img.astype(np.float64) / 255.0
        h, w, _ = f.shape
        lum = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        hh, wh = max(h // 2, 1), max(w // 2, 1)
        feats = [
            *f.reshape(-1, 3).mean(axis=0),          # channel means
            *f.reshape(-1, 3).std(axis=0),           # channel stds
            min(w / h, 4.0) / 4.0,                   # bounded aspect
            float(lum[:hh, :wh].mean()),             # 2x2 region luminances
            float(lum[:hh, wh:].mean()) if w > 1 else 0.0,
            float(lum[hh:, :wh].mean()) if h > 1 else 0.0,
            float(lum[hh:, wh:].mean()) if h > 1 and w > 1 else 0.0,
        ]
        reps = (dim + len(feats) - 1) // len(feats)
        return [float(x) for x in (feats * reps)[:dim]]

    def featurize(batches):
        for pdf in batches:
            ids, vecs = [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(item_id))
                if payload is None:
                    vecs.append(None)
                    continue
                b = bytes(payload)
                if stub:
                    n = len(b)
                    v = [((n * (2 * j + 3) + 7 * j) % 1000) / 1000.0
                         for j in range(dim)]
                else:
                    v = real_features(b)
                if v is not None and normalize:
                    norm = sum(x * x for x in v) ** 0.5 or 1.0
                    v = [x / norm for x in v]
                vecs.append(v)
            yield pd.DataFrame({"item_id": ids, "features": vecs})

    return df.select(id_col, payload_col).mapInPandas(
        featurize, "item_id long, features array<float>"
    )


def resize_image(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    width: int = 64,
    height: int = 64,
    stub: bool = True,
) -> DataFrame:
    """Image resize: payload → resized payload + output dims (binary in,
    binary out, metadata updated — the in-place media-transform shape).

    ``stub=False`` (the real path): sniff the container (JPEG/PNG/BMP),
    decode with the pure-Python codecs, nearest-neighbor resample to
    ``width×height``, re-encode as PNG (lossless, so the output is a
    deterministic function of the input bytes).  Unrecognized payloads
    pass through as null.  ``stub=True`` keeps the legacy truncate/cycle
    fake for the arithmetic-oracle queries."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)
    target = width * height

    def resize(batches):
        import numpy as np

        from smartpy_arc_spark.multimodal.codecs import make_png, parse_bmp, parse_png
        from smartpy_arc_spark.multimodal.jpeg import parse_jpeg

        def real_resize(b: bytes) -> bytes | None:
            try:
                if b[:2] == b"\xff\xd8":
                    img = parse_jpeg(b)
                elif b[:8] == b"\x89PNG\r\n\x1a\n":
                    img = parse_png(b)
                elif b[:2] == b"BM":
                    img = parse_bmp(b)
                else:
                    return None
            except Exception:
                return None
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            h0, w0, _ = img.shape
            ys = (np.arange(height) * h0) // height
            xs = (np.arange(width) * w0) // width
            return make_png(img[ys][:, xs])

        for pdf in batches:
            ids, payloads = [], []
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(item_id))
                if payload is None:
                    payloads.append(None)
                    continue
                b = bytes(payload)
                if stub:
                    reps = (target // max(len(b), 1)) + 1
                    payloads.append((b * reps)[:target])
                else:
                    payloads.append(real_resize(b))
            yield pd.DataFrame(
                {"item_id": ids, "payload": payloads,
                 "width": [width] * len(ids), "height": [height] * len(ids)}
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize, "item_id long, payload binary, width int, height int"
    )
