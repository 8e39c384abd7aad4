"""Custom connector: dBASE/xBase ``.dbf`` tables as a Spark data source.

The reference's *folder workspace* is the shapefile/dbf world —
``arc_pandas.py:17-21`` ("if the workspace is a folder, then it is assumed
the tables are dbfs") — with all parsing delegated to arcpy.  Here the
format is implemented natively: a pure-Python DBF header/record codec and a
PySpark 4 Python Data Source (``pyspark.sql.datasource``) wrapping it, so

    spark.read.format("dbf").load("/path/to/folder_or_file")

works like any built-in source: schema from the file header (no inference
scan), one input partition per file (DBF has no internal row grouping —
parallelism comes from many files, the layout a folder workspace has), and
per-partition iteration on executors, never the driver.

Field types (dBASE III/IV): C=char → string, N=numeric → bigint (or double
when decimals>0), F=float → double, L=logical → boolean, D=date → date.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# ---------------------------------------------------------------------------
# pure-python codec


def _parse_fields(header: bytes) -> list[tuple[str, str, int, int]]:
    """Field descriptor array: 32-byte entries until the 0x0D terminator."""
    fields = []
    off = 32
    while off < len(header) and header[off] != 0x0D:
        raw = header[off : off + 32]
        name = raw[:11].split(b"\x00", 1)[0].decode("ascii")
        ftype = chr(raw[11])
        length = raw[16]
        decimals = raw[17]
        fields.append((name, ftype, length, decimals))
        off += 32
    return fields


def read_dbf_header(path: str) -> tuple[int, int, int, list[tuple[str, str, int, int]]]:
    """Return (n_records, header_len, record_len, fields)."""
    with open(path, "rb") as fh:
        head = fh.read(32)
        n_records, header_len, record_len = struct.unpack("<IHH", head[4:12])
        fh.seek(0)
        header = fh.read(header_len)
    return n_records, header_len, record_len, _parse_fields(header)


def _decode_value(raw: bytes, ftype: str, decimals: int) -> Any:
    s = raw.decode("ascii", errors="replace").strip()
    if ftype == "C":
        return s or None
    if not s or s == "*" * len(s):
        return None
    if ftype in ("N", "F"):
        return float(s) if (decimals > 0 or ftype == "F") else int(s)
    if ftype == "L":
        return None if s in ("?", "") else s in ("Y", "y", "T", "t")
    if ftype == "D":
        return dt.date(int(s[:4]), int(s[4:6]), int(s[6:8]))
    return s or None


def iter_dbf_records(path: str) -> Iterator[tuple]:
    """Yield undeleted records as python tuples (streamed, O(record) memory)."""
    n_records, header_len, record_len, fields = read_dbf_header(path)
    with open(path, "rb") as fh:
        fh.seek(header_len)
        for _ in range(n_records):
            rec = fh.read(record_len)
            if len(rec) < record_len or rec[0:1] == b"\x1a":
                break
            if rec[0:1] == b"*":  # deleted row
                continue
            out, off = [], 1
            for _name, ftype, length, decimals in fields:
                out.append(_decode_value(rec[off : off + length], ftype, decimals))
                off += length
            yield tuple(out)


def dbf_spark_schema(fields: list[tuple[str, str, int, int]]) -> str:
    """DDL schema string for a DBF field list."""
    type_map = {"C": "string", "L": "boolean", "D": "date"}
    parts = []
    for name, ftype, _length, decimals in fields:
        if ftype in ("N", "F"):
            t = "double" if (decimals > 0 or ftype == "F") else "bigint"
        else:
            t = type_map.get(ftype, "string")
        parts.append(f"`{name}` {t}")
    return ", ".join(parts)


def write_dbf(path: str, rows: list[tuple], fields: list[tuple[str, str, int, int]]) -> str:
    """Minimal dBASE III writer (C/N/F/L/D) — the sink half of folder-
    workspace parity and the round-trip fixture for the reader."""
    record_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    with open(path, "wb") as fh:
        today = dt.date.today()
        fh.write(
            struct.pack(
                "<BBBBIHH20x",
                0x03, today.year % 100, today.month, today.day,
                len(rows), header_len, record_len,
            )
        )
        for name, ftype, length, decimals in fields:
            fh.write(
                struct.pack(
                    "<11sc4xBB14x",
                    name.encode("ascii")[:11], ftype.encode("ascii"),
                    length, decimals,
                )
            )
        fh.write(b"\x0d")
        for row in rows:
            fh.write(b" ")
            for val, (name, ftype, length, decimals) in zip(row, fields):
                if val is None:
                    s = "" if ftype == "C" else " " * length
                elif ftype == "C":
                    s = str(val)[:length]
                elif ftype in ("N", "F"):
                    s = (
                        f"{val:.{decimals}f}" if decimals else str(int(val))
                    ).rjust(length)[:length]
                elif ftype == "L":
                    s = "T" if val else "F"
                elif ftype == "D":
                    s = f"{val.year:04d}{val.month:02d}{val.day:02d}"
                else:
                    s = str(val)
                fh.write(s.ljust(length).encode("ascii"))
        fh.write(b"\x1a")
    return path


# ---------------------------------------------------------------------------
# Spark data source


def _dbf_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.dbf")))
    return [path]


class _DbfPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DbfReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dbf source requires a path")

    def partitions(self) -> list[InputPartition]:
        # one partition per file: DBF has no internal splits; a folder
        # workspace of many tables/shards reads fully in parallel
        return [_DbfPartition(p) for p in _dbf_paths(self.path)]

    def read(self, partition: _DbfPartition) -> Iterator[tuple]:
        yield from iter_dbf_records(partition.path)


class DbfDataSource(DataSource):
    """``spark.read.format("dbf").load(path)`` — path is a .dbf file or a
    folder of them (the reference's folder workspace)."""

    @classmethod
    def name(cls) -> str:
        return "dbf"

    def schema(self) -> str:
        paths = _dbf_paths(self.options.get("path", ""))
        if not paths:
            raise ValueError(f"no .dbf files at {self.options.get('path')}")
        return dbf_spark_schema(read_dbf_header(paths[0])[3])

    def reader(self, schema) -> DbfReader:
        return DbfReader(dict(self.options))


def register_dbf_source(spark) -> None:
    """Idempotently register the dbf format on a session."""
    from smartpy_arc_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    spark.dataSource.register(DbfDataSource)
