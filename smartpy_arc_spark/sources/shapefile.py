"""Custom connector: ESRI shapefiles as a Spark data source.

Completes the reference's *folder workspace* (arc_pandas.py:17-21 — a
folder means shapefiles/dbf tables): the ``dbf`` source reads only the
attribute side; this source pairs each ``.shp`` geometry file with its
``.dbf`` sibling so

    spark.read.format("shapefile").load("/path/to/folder_or_file.shp")

yields the attribute columns plus a ``geometry`` WKB binary column (record
i of the .shp aligns with record i of the .dbf by the shapefile contract).
CRS text rides in the sibling ``.prj`` — exposed via :func:`read_prj` and
attached as column metadata by ``scan(fmt="shp")``.

File layout per the public ESRI Shapefile Technical Description: 100-byte
header (big-endian file code 9994 / length, little-endian version + shape
type + bbox), then records of (record number BE, content length BE in
16-bit words, shape buffer).  The shape buffer itself is decoded by
:mod:`geometry.esrishape` — the same codec that backs the ESRISHAPE wire
encoding.

One input partition per shapefile: a .shp has no internal splits (records
are variable-length with no sync markers), so parallelism comes from many
files — exactly the layout a folder workspace has.  Each partition streams
records on an executor; nothing is read on the driver but the header.
"""

from __future__ import annotations

import glob
import os
import struct
from collections.abc import Iterator

import numpy as np

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from smartpy_arc_spark.sources.dbf import (
    dbf_spark_schema,
    iter_dbf_records,
    read_dbf_header,
)

_SHP_FILE_CODE = 9994
_SHP_VERSION = 1000


def iter_shp_wkb(path: str) -> Iterator[bytes | None]:
    """Yield one WKB (or None for Null shapes) per .shp record, streamed."""
    from smartpy_arc_spark.geometry.esrishape import shape_to_wkb

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        head = fh.read(100)
        (code,) = struct.unpack_from(">i", head, 0)
        if code != _SHP_FILE_CODE:
            raise ValueError(f"{path}: not a shapefile (file code {code})")
        off = 100
        while off + 8 <= size:
            rec_head = fh.read(8)
            if len(rec_head) < 8:
                break
            _rec_no, content_words = struct.unpack(">ii", rec_head)
            content = fh.read(content_words * 2)
            if len(content) < content_words * 2:
                break
            yield shape_to_wkb(content)
            off += 8 + content_words * 2


def read_prj(shp_path: str) -> str | None:
    """CRS WKT from the sibling .prj, if present."""
    prj = os.path.splitext(shp_path)[0] + ".prj"
    if os.path.exists(prj):
        with open(prj, encoding="ascii", errors="replace") as fh:
            return fh.read().strip() or None
    return None


def _shp_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.shp")))
    return [path]


def _dbf_sibling(shp_path: str) -> str | None:
    dbf = os.path.splitext(shp_path)[0] + ".dbf"
    return dbf if os.path.exists(dbf) else None


class _ShpPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ShapefileReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("shapefile source requires a path")

    def partitions(self) -> list[InputPartition]:
        return [_ShpPartition(p) for p in _shp_paths(self.path)]

    def read(self, partition: _ShpPartition) -> Iterator[tuple]:
        dbf = _dbf_sibling(partition.path)
        if dbf is None:
            for wkb in iter_shp_wkb(partition.path):
                yield (wkb,)
        else:
            for attrs, wkb in zip(iter_dbf_records(dbf), iter_shp_wkb(partition.path)):
                yield (*attrs, wkb)


class ShapefileDataSource(DataSource):
    """``spark.read.format("shapefile").load(path)`` — path is a .shp file
    or a folder of them (the reference's folder workspace)."""

    @classmethod
    def name(cls) -> str:
        return "shapefile"

    def schema(self) -> str:
        paths = _shp_paths(self.options.get("path", ""))
        if not paths:
            raise ValueError(f"no .shp files at {self.options.get('path')}")
        dbf = _dbf_sibling(paths[0])
        attr = dbf_spark_schema(read_dbf_header(dbf)[3]) + ", " if dbf else ""
        return attr + "`geometry` binary"

    def reader(self, schema) -> ShapefileReader:
        return ShapefileReader(dict(self.options))


def register_shapefile_source(spark) -> None:
    """Idempotently register the shapefile format on a session."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    spark.dataSource.register(ShapefileDataSource)


# ---------------------------------------------------------------------------
# writer (sink half of folder-workspace parity + round-trip fixtures)


def write_shapefile(
    base_path: str,
    rows: list[tuple],
    fields: list[tuple[str, str, int, int]],
    wkbs: list[bytes | None],
    crs_wkt: str | None = None,
) -> str:
    """Write ``<base>.shp`` + ``.shx`` + ``.dbf`` (+ ``.prj``) from rows of
    attributes (dbf field descriptors as in :mod:`sources.dbf`) and WKB
    geometries.  Returns the .shp path."""
    from smartpy_arc_spark.geometry.esrishape import wkb_to_shape
    from smartpy_arc_spark.sources.dbf import write_dbf

    base, ext = os.path.splitext(base_path)
    shp_path = base + ".shp"

    buffers = [wkb_to_shape(w) for w in wkbs]
    # overall shape type: first non-null record's type (homogeneous by spec)
    shape_type = 0
    coords = []
    for b in buffers:
        (stype,) = struct.unpack_from("<i", b, 0)
        if stype != 0 and shape_type == 0:
            shape_type = stype
    # bbox over all geometries, via each buffer's own bbox (points carry xy)
    for b in buffers:
        (stype,) = struct.unpack_from("<i", b, 0)
        if stype == 1:
            x, y = struct.unpack_from("<dd", b, 4)
            coords.append((x, y, x, y))
        elif stype != 0:
            x0, y0, x1, y1 = struct.unpack_from("<4d", b, 4)
            coords.append((x0, y0, x1, y1))
    if coords:
        arr = np.asarray(coords)
        bbox = (arr[:, 0].min(), arr[:, 1].min(), arr[:, 2].max(), arr[:, 3].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    content_words = [len(b) // 2 for b in buffers]
    shp_len_words = 50 + sum(4 + w for w in content_words)
    shx_len_words = 50 + 4 * len(buffers)

    def header(length_words: int) -> bytes:
        return struct.pack(
            ">i5ii", _SHP_FILE_CODE, 0, 0, 0, 0, 0, length_words
        ) + struct.pack("<ii8d", _SHP_VERSION, shape_type, *bbox, 0, 0, 0, 0)

    with open(shp_path, "wb") as shp, open(base + ".shx", "wb") as shx:
        shp.write(header(shp_len_words))
        shx.write(header(shx_len_words))
        off_words = 50
        for i, buf in enumerate(buffers):
            words = content_words[i]
            shp.write(struct.pack(">ii", i + 1, words))
            shp.write(buf)
            shx.write(struct.pack(">ii", off_words, words))
            off_words += 4 + words

    write_dbf(base + ".dbf", rows, fields)
    if crs_wkt:
        with open(base + ".prj", "w", encoding="ascii") as fh:
            fh.write(crs_wkt)
    return shp_path
