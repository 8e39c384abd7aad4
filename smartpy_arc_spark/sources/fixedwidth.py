"""Fixed-width text files: the mainframe/legacy-export interchange format.

A column spec is ``[(name, width, dtype), ...]``; fields are sliced by
byte position.  Writing pads each field to its width (strings left-
aligned, numbers right-aligned — the COBOL copybook convention); reading
slices with ``substring`` and trims — both pure codegen expressions over
``spark.read.text`` lines, so scans parallelize like any text source and
the parse costs no Python.

Values wider than their field raise at write time (silent truncation
corrupts data unrecoverably — the classic fixed-width failure).

Reference surface: the reference exchanges tables with ArcGIS
(smartpy_arc/arc_utils.py:614-747 delegates to arcpy readers); this adds
the flat-file leg such pipelines usually need alongside dbf/shp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Spec = list[tuple[str, int, str]]

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def write_fixed_width(df: DataFrame, path: str, spec: Spec) -> None:
    """Serialize ``df`` to fixed-width lines at ``path`` (one text part
    per partition — distributed write, no driver collect)."""
    fields = []
    for name, width, dtype in spec:
        s = F.col(name).cast("string")
        padded = (
            F.lpad(s, width, " ") if _is_numeric(dtype) else F.rpad(s, width, " ")
        )
        # overflow guard: a value wider than its field would be truncated
        fields.append(
            F.when(F.length(s) > width, F.raise_error(
                F.concat(F.lit(f"fixed-width overflow in '{name}': "), s)
            )).otherwise(padded)
        )
    df.select(F.concat(*fields).alias("value")).write.mode("overwrite").text(
        path
    )


def read_fixed_width(spark: SparkSession, path: str, spec: Spec) -> DataFrame:
    """Parse fixed-width lines at ``path`` into typed columns."""
    out = spark.read.text(path)
    pos = 1
    cols = []
    for name, width, dtype in spec:
        raw = F.substring(F.col("value"), pos, width)
        cols.append(F.trim(raw).cast(dtype).alias(name))
        pos += width
    return out.select(*cols)
