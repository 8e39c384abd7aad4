"""Schema-metadata helpers: column *roles* carried on StructField metadata.

The reference geodatabase tracks system columns (object-id field, shape
field, CRS, varchar length) in its catalog and exposes them via
``arcpy.Describe`` / ``ListFields`` (reference: arc_utils.py:42-84).  We carry
the same facts as StructField metadata, mirroring how the reference tags
Arrow fields with ``esri.encoding`` / ``esri.sr_wkt`` (arc_utils.py:1104-1109).

Roles:
  * ``{"role": "oid"}``                      — engine row id column
  * ``{"role": "geometry", "crs": <wkt>, "encoding": "WKB"}``
  * ``{"varchar_length": n}``                — string max length
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField

ROLE_KEY = "role"
ROLE_OID = "oid"
ROLE_GEOMETRY = "geometry"
CRS_KEY = "crs"
ENCODING_KEY = "encoding"
VARCHAR_LEN_KEY = "varchar_length"


def with_field_metadata(df: DataFrame, column: str, metadata: dict) -> DataFrame:
    """Attach (merge) metadata onto one column's StructField."""
    field = df.schema[column]
    merged = {**(field.metadata or {}), **metadata}
    return df.withColumn(column, F.col(column).alias(column, metadata=merged))


def field_role(field: StructField) -> str | None:
    return (field.metadata or {}).get(ROLE_KEY)


def find_role_column(df: DataFrame, role: str) -> str | None:
    """First column carrying the given role, else None."""
    for field in df.schema.fields:
        if field_role(field) == role:
            return field.name
    return None


def tag_oid(df: DataFrame, column: str) -> DataFrame:
    return with_field_metadata(df, column, {ROLE_KEY: ROLE_OID})


def tag_geometry(df: DataFrame, column: str, crs: str | None = None,
                 encoding: str = "WKB") -> DataFrame:
    md: dict = {ROLE_KEY: ROLE_GEOMETRY, ENCODING_KEY: encoding}
    if crs is not None:
        md[CRS_KEY] = crs
    return with_field_metadata(df, column, md)


def tag_varchar(df: DataFrame, column: str, length: int) -> DataFrame:
    return with_field_metadata(df, column, {VARCHAR_LEN_KEY: int(length)})
