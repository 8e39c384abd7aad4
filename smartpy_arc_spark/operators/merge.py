"""MERGE INTO / CDC upsert emulation (no Delta/Iceberg jars in this image).

``merge_upsert`` is the classic anti-join + union: updates win on key
collision, unmatched target rows pass through — semantically MERGE INTO
WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT for whole rows.

``scd2_apply`` applies a batch of changes as slowly-changing-dimension
type 2: matched current rows are closed (valid_to = change ts) and a new
current row is opened per change.

Both are two-shuffle constructions (one join, one union that AQE folds);
with Delta on the classpath swap for a real ``MERGE INTO`` — the call
signatures are designed to be drop-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Updates replace matched target rows; unmatched pass through.
    Schemas must be union-compatible by name."""
    kept = target.join(updates.select(key), on=key, how="left_anti")
    return kept.unionByName(updates.select(target.columns))


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD2: close matched current rows at the change timestamp, open a new
    current row per change.  ``current`` must carry open rows with
    ``valid_to IS NULL``; ``changes`` carries the new attribute values plus
    ``ts_col``."""
    change_keys = changes.select(key, F.col(ts_col).alias("_new_from"))
    closed = (
        current.join(change_keys, on=key, how="inner")
        .where(F.col(valid_to).isNull())
        .withColumn(valid_to, F.col("_new_from"))
        .drop("_new_from")
    )
    untouched = current.join(changes.select(key), on=key, how="left_anti")
    already_closed = (
        current.join(change_keys.select(key), on=key, how="left_semi")
        .where(F.col(valid_to).isNotNull())
    )
    opened = (
        changes.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lit(None).cast(current.schema[valid_to].dataType))
        .drop(ts_col)
        .select(*[c for c in current.columns])
    )
    return (
        untouched.unionByName(already_closed)
        .unionByName(closed)
        .unionByName(opened)
    )
