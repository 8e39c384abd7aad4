"""Layers / views — P1/P2 (SURVEY.md §2.3).

A reference *layer* (arc_utils.py:422-474) is a named, non-materialized view
carrying a projection (VISIBLE/HIDDEN + renames via FieldInfo,
arc_utils.py:457-468) and a definition-query filter (arc_utils.py:471-474).
That is exactly a Spark temp view over a lazy DataFrame — same laziness,
same pushdown through later queries.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def field_map(
    flds: Sequence[str] | Mapping[str, str],
    fld_lens: Mapping[str, int] | None = None,
) -> list[Column]:
    """P2 ``get_field_map`` (arc_utils.py:387-420): a projection+rename
    descriptor.  A list means identity rename (arc_utils.py:405-406); a dict
    maps {source: output}.  Varchar lengths ride along as metadata.
    Returns a list of Columns consumable by ``df.select``."""
    fld_lens = fld_lens or {}
    if isinstance(flds, Mapping):
        pairs = list(flds.items())
    else:
        pairs = [(c, c) for c in flds]
    cols = []
    for src, out in pairs:
        c = F.col(src)
        if out in fld_lens or src in fld_lens:
            n = fld_lens.get(out, fld_lens.get(src))
            c = c.alias(out, metadata={"varchar_length": int(n)})
        else:
            c = c.alias(out)
        cols.append(c)
    return cols


def create_layer(
    df: DataFrame,
    layer_name: str,
    *,
    flds: Sequence[str] | Mapping[str, str] | None = None,
    where: str | None = None,
    area_col: str | None = None,
    shp_prefix: str | None = None,
) -> DataFrame:
    """P1 ``create_layer`` (arc_utils.py:422-474): register a lazy named view
    with projection/rename + filter.

    ``shp_prefix`` adds a derived ``<prefix>_area`` column (the reference
    derives it from the polygon geometry, arc_utils.py:451-455): from
    ``area_col`` when named, else computed from the DataFrame's
    geometry-role column via ``st_area``.  Returns the underlying DataFrame
    (the view is also registered under ``layer_name``).
    """
    out = df
    if where:
        out = out.where(where)
    if shp_prefix:
        if area_col:
            out = out.withColumn(f"{shp_prefix}_area", F.col(area_col))
        else:
            from smartpy_arc_spark.meta import ROLE_GEOMETRY, field_role

            g = next(
                (f.name for f in out.schema.fields
                 if field_role(f) == ROLE_GEOMETRY),
                "geometry" if "geometry" in out.columns else None,
            )
            if g is not None:
                from smartpy_arc_spark.geometry import st_area

                out = out.withColumn(f"{shp_prefix}_area", st_area(F.col(g)))
    if flds is not None:
        cols = field_map(flds)
        if shp_prefix and area_col:
            cols = cols + [F.col(f"{shp_prefix}_area")]
        out = out.select(cols)
    out.createOrReplaceTempView(layer_name)
    return out
