"""Deterministic, engine-portable sampling operators.

Random `df.sample()` draws differ run-to-run and engine-to-engine; for
training-data pipelines a *content-hash* sample is reproducible anywhere
(same rows selected by Spark, DuckDB, or a Python script), stable under
repartitioning, and needs no seed bookkeeping — the selection is a pure
function of the row content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash_sample(
    df: DataFrame,
    col: str,
    *,
    sixteenths: int = 3,
) -> DataFrame:
    """Keep rows whose md5(col) starts with one of the first `sixteenths`
    hex digits — a deterministic ≈ sixteenths/16 sample.

    md5 is uniform over hex digits, the filter is a pure row-local
    expression (no shuffle, pushes below everything except the scan), and
    the same predicate reproduces the exact sample in any engine."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    digits = [format(i, "x") for i in range(sixteenths)]
    return df.where(F.substring(F.md5(F.col(col)), 1, 1).isin(digits))
