"""Schema/row introspection — S7/S8 (SURVEY.md §2.1).

Reference: ``row_count`` (arc_utils.py:33-39), ``list_flds`` /
``list_fld_types`` (arc_utils.py:42-63, incl. varchar length),
``get_oid_fld`` (arc_utils.py:67-72), ``get_shp_fld`` (arc_utils.py:75-84).
All were catalog lookups against the geodatabase; here they read the
DataFrame schema and the role metadata from :mod:`smartpy_arc_spark.meta`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from smartpy_arc_spark.meta import (
    ROLE_GEOMETRY,
    ROLE_OID,
    VARCHAR_LEN_KEY,
    find_role_column,
)


def row_count(df: DataFrame) -> int:
    """COUNT(*) — distributed, partial-aggregated by Spark."""
    return df.count()


def list_flds(df: DataFrame) -> list[str]:
    return list(df.columns)


def list_fld_types(df: DataFrame) -> dict[str, str]:
    """{name: type string}; strings with a tracked max length render as
    ``String (n)`` like the reference (arc_utils.py:59-63)."""
    out: dict[str, str] = {}
    for field in df.schema.fields:
        type_name = field.dataType.simpleString()
        length = (field.metadata or {}).get(VARCHAR_LEN_KEY)
        if length is not None:
            type_name = f"{type_name} ({length})"
        out[field.name] = type_name
    return out


def get_oid_fld(df: DataFrame) -> str | None:
    return find_role_column(df, ROLE_OID)


def get_shp_fld(df: DataFrame) -> str | None:
    return find_role_column(df, ROLE_GEOMETRY)
