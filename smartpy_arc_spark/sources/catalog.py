"""Catalog navigation + external connections — S4/S5/S6 (SURVEY.md §2.1).

Reference behaviors re-expressed over ``spark.catalog``:
  * ``get_df`` (pro_utils.py:133-168): resolve a unique layer-or-table name,
    error on 0 or >1 hits (pro_utils.py:163-167), then scan.
  * ``get_layer``/``get_table`` uniqueness enforcement (pro_utils.py:99-103,
    :126-130).  (The reference's ``get_map`` raise-on-found bug at
    pro_utils.py:74-76 is deliberately NOT reproduced.)
  * ``get_db_conn`` (arc_utils.py:339-373): an SDE connection file for SQL
    Server; Spark's JDBC connector replaces connection files entirely —
    ``jdbc_conn`` returns a configured reader factory.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession


class CatalogLookupError(LookupError):
    """0 or >1 catalog matches for a requested name."""


def get_table_unique(spark: SparkSession, name: str, database: str | None = None) -> str:
    """Resolve ``name`` to exactly one catalog table/view (case-insensitive),
    raising on 0 or >1 matches — the reference's uniqueness contract
    (pro_utils.py:99-103, :126-130, :163-167)."""
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    hits = [t for t in tables if t.name.lower() == name.lower()]
    if not hits:
        raise CatalogLookupError(f"no table or view named {name!r}")
    if len(hits) > 1:
        raise CatalogLookupError(
            f"multiple tables named {name!r}: "
            + ", ".join(f"{t.database}.{t.name}" for t in hits)
        )
    t = hits[0]
    return f"{t.database}.{t.name}" if t.database else t.name


def get_df(
    spark: SparkSession,
    name: str,
    *,
    flds=None,
    where: str | None = None,
    database: str | None = None,
) -> DataFrame:
    """``get_df`` equivalent: unique catalog lookup → DataFrame, honoring the
    view's own filter/projection (a temp view IS the reference's
    layer-with-selection, SURVEY.md §1.1) plus optional extra where/flds."""
    df = spark.table(get_table_unique(spark, name, database))
    if where:
        df = df.where(where)
    if flds is not None:
        from smartpy_arc_spark.sources.scan import _case_insensitive_resolve
        from pyspark.sql import functions as F

        if isinstance(flds, Mapping):
            resolved = _case_insensitive_resolve(df.columns, list(flds))
            df = df.select([F.col(a).alias(flds[r]) for a, r in resolved])
        else:
            resolved = _case_insensitive_resolve(df.columns, list(flds))
            df = df.select([F.col(a).alias(r) for a, r in resolved])
    return df


def jdbc_conn(
    spark: SparkSession,
    server: str | None = None,
    database: str | None = None,
    *,
    port: int = 1433,
    integrated_security: bool = True,
    url: str | None = None,
    properties: dict | None = None,
):
    """``get_db_conn`` equivalent (arc_utils.py:339-373): instead of writing a
    ``.sde`` connection file, return a ``read(table_or_query)`` callable bound
    to a JDBC URL.  OS-auth maps to integratedSecurity.

    ``server``/``database`` build the reference's SQL Server URL shape;
    ``url`` overrides it for any other JDBC target (the test suite drives
    this against the Derby embedded engine bundled with Spark).  Catalyst
    pushes filters/projection into the remote query (asserted in
    tests/test_scan.py); partitioned reads should pass
    ``partitionColumn/lowerBound/upperBound/numPartitions`` via properties
    for parallel extraction at scale.
    """
    if url is None:
        if server is None or database is None:
            raise ValueError("either url or server+database is required")
        url = f"jdbc:sqlserver://{server}:{port};databaseName={database}"
        if integrated_security:
            url += ";integratedSecurity=true"
    props = dict(properties or {})
    bound_url = url

    def read(table_or_query: str) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", bound_url)
            .option("dbtable", table_or_query)
        )
        for k, v in props.items():
            reader = reader.option(k, v)
        return reader.load()

    return read


def open_workspace(
    spark: SparkSession,
    workspace: str,
    *,
    fmt: str = "parquet",
    nanos_ts_cols: Mapping[str, list] | None = None,
) -> list[str]:
    """Register every ``<name>.<fmt>`` table in a folder workspace as a
    temp view named ``<name>`` — the reference's workspace concept
    (``arcpy.env.workspace``) mapped onto the Spark catalog, which turns
    the whole engine into a PLAIN-SQL surface:

        open_workspace(spark, "/data/sf0.1")
        spark.sql("SELECT ... FROM orders JOIN customer ON ...")

    Views are lazy scans (predicate pushdown / column pruning intact);
    registration touches no data.  ``nanos_ts_cols`` maps table name →
    event-time columns needing the TIMESTAMP(NANOS) normalization (the
    ``events.ts`` case).  Returns the sorted registered names.
    """
    import glob as _glob
    import os as _os

    from smartpy_arc_spark.sources.scan import scan

    names = []
    for p in sorted(_glob.glob(_os.path.join(workspace, f"*.{fmt}"))):
        name = _os.path.splitext(_os.path.basename(p))[0]
        df = scan(
            spark, workspace, name, fmt=fmt,
            nanos_ts_cols=(nanos_ts_cols or {}).get(name, ()),
        )
        df.createOrReplaceTempView(name)
        names.append(name)
    return names
