"""Statistical tests as aggregates: chi-square independence, Welch t.

The two workhorse significance tests of product/data analysis, computed
as pure aggregate arithmetic (no SciPy, no sampling):

* ``chi_square_independence`` — is categorical column A independent of
  B?  The classic contingency-table statistic
  ``Σ (observed − expected)² / expected``.
* ``welch_t_test`` — do two cohorts have the same mean?  Welch's
  unequal-variance t, the safe default over Student's t.

Both output the STATISTIC (and degrees of freedom), not a p-value —
p-values need the incomplete-gamma/Student CDFs, which belong to the
caller's stats library; the distributed part is the counting, which is
what costs anything at 100 TB.

Scale shape: chi-square is two hash aggregates over bounded key spaces
(cells, then margins — broadcast back); Welch is one grouped aggregate
(count/avg/variance per cohort) and a 2-row combine.  The detail table
is scanned once in both.

No counterpart in the reference repo; analytics extension surface
(SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns.  Returns one row ``(chi2 rounded to 4, dof, n)``.

    Cells and margins are hash aggregates over the (bounded) category
    key spaces; expected counts come from broadcast margins, so the
    detail table is read exactly once.
    """
    cells = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    ra = cells.groupBy(col_a).agg(F.sum("o").alias("ra"))
    rb = cells.groupBy(col_b).agg(F.sum("o").alias("rb"))
    n = cells.agg(F.sum("o").alias("n"))
    scored = (
        cells.join(F.broadcast(ra), col_a)
        .join(F.broadcast(rb), col_b)
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("ra") * F.col("rb") / F.col("n"))
        .withColumn(
            "cell_chi2",
            (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"),
        )
    )
    ka = ra.count()
    kb = rb.count()
    return scored.agg(
        (F.round(F.sum("cell_chi2"), 4) + F.lit(0.0)).alias("chi2"),
        F.lit((ka - 1) * (kb - 1)).cast("long").alias("dof"),
        F.max("n").cast("long").alias("n"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance t statistic between two cohorts.

    Returns one row ``(mean_a, mean_b, t_stat, dof)`` — means rounded to
    4, t to 4, Welch–Satterthwaite dof to 2.  One grouped aggregate
    (count / mean / sample variance per cohort), then a 2-row combine.
    """
    stats = (
        df.where(F.col(group_col).isin(group_a, group_b))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("double").alias("n"),
            F.avg(value_col).alias("m"),
            F.var_samp(value_col).alias("v"),
        )
    )
    a = stats.where(F.col(group_col) == group_a).select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    b = stats.where(F.col(group_col) == group_b).select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    j = a.crossJoin(b)
    se2a = F.col("va") / F.col("na")
    se2b = F.col("vb") / F.col("nb")
    t = (F.col("ma") - F.col("mb")) / F.sqrt(se2a + se2b)
    dof = (
        (se2a + se2b) * (se2a + se2b)
        / (
            se2a * se2a / (F.col("na") - 1)
            + se2b * se2b / (F.col("nb") - 1)
        )
    )
    return j.select(
        (F.round(F.col("ma"), 4) + F.lit(0.0)).alias("mean_a"),
        (F.round(F.col("mb"), 4) + F.lit(0.0)).alias("mean_b"),
        (F.round(t, 4) + F.lit(0.0)).alias("t_stat"),
        (F.round(dof, 2) + F.lit(0.0)).alias("dof"),
    )
