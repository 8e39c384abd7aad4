"""Geometry subsystem.

The reference's geometry model (SURVEY.md §1.4): geometry is a column with a
wire encoding (ESRISHAPE/ESRIJSON/GEOJSON/WKT/WKB) plus CRS metadata; scalar
columns (x/y/area/length) are derived from it on scan.  Here the canonical
encoding is WKB in a BinaryType column with ``{"role": "geometry", "crs": ...,
"encoding": "WKB"}`` StructField metadata.

No Sedona/Shapely in this container, so the kernel is a small pure-numpy
WKB + polygon-math library (:mod:`wkb`, :mod:`core`) used inside
Arrow-batched pandas UDFs (:mod:`columns`, :mod:`split`).  The UDF boundary
is per-geometry and embarrassingly parallel — no shuffle anywhere in the
geometry path, so it scales linearly with partitions.
"""

from smartpy_arc_spark.geometry.columns import (
    add_geometry_derived,
    decode_geometry,
    encode_geometry,
    from_esrijson,
    from_esrishape,
    from_geojson,
    from_wkt,
    get_centroids,
    st_area,
    st_centroid_xy,
    st_length,
    to_esrijson,
    to_esrishape,
    to_geojson,
    to_wkt,
)
from smartpy_arc_spark.geometry.split import split_equal_area

__all__ = [
    "add_geometry_derived",
    "decode_geometry",
    "encode_geometry",
    "from_esrijson",
    "from_esrishape",
    "from_geojson",
    "from_wkt",
    "get_centroids",
    "st_area",
    "st_centroid_xy",
    "st_length",
    "to_esrijson",
    "to_esrishape",
    "to_geojson",
    "to_wkt",
    "split_equal_area",
]
