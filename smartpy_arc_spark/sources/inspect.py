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


# widening chains a reader can always follow without data loss
_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"), ("float", "double"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
}


def schema_compat_report(
    old: DataFrame, new: DataFrame
) -> list[dict]:
    """Data-contract check between two schema versions: classify every
    column change as ``added`` / ``removed`` / ``widened`` (safe numeric
    promotion) / ``narrowed_or_changed`` (breaking).  Removed columns and
    type changes outside the safe widening chains are what break
    downstream readers — the review gate before publishing a new
    snapshot version (complements ``sinks/snapshot.py``'s append-time
    validation).

    Pure metadata — no job runs.  Returns a list of
    ``{"column", "change", "old_type", "new_type"}`` dicts, breaking
    changes first, then alphabetical.
    """
    o = dict(old.dtypes)
    n = dict(new.dtypes)
    out = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            out.append({"column": c, "change": "removed",
                        "old_type": o[c], "new_type": None})
        elif c not in o:
            out.append({"column": c, "change": "added",
                        "old_type": None, "new_type": n[c]})
        elif o[c] != n[c]:
            kind = (
                "widened" if (o[c], n[c]) in _WIDENINGS
                else "narrowed_or_changed"
            )
            out.append({"column": c, "change": kind,
                        "old_type": o[c], "new_type": n[c]})
    severity = {"removed": 0, "narrowed_or_changed": 0,
                "widened": 1, "added": 2}
    return sorted(out, key=lambda r: (severity[r["change"]], r["column"]))


def is_breaking_change(report: list[dict]) -> bool:
    """True when the report contains reader-breaking changes."""
    return any(
        r["change"] in ("removed", "narrowed_or_changed") for r in report
    )
