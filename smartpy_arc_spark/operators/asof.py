"""As-of (most-recent-at-or-before) join.

Spark has no native as-of join (the reference has no joins beyond single-key
equi at all — SURVEY.md §2.4); this is the standard union-tag-window
construction:

  1. union the left (probe) and right (reference) streams with a tag,
  2. hash-partition by key, sort by (event time, tag) within partitions,
  3. ``last(ref_struct, ignorenulls=True)`` over the preceding window
     carries the most recent reference row forward onto each probe row
     (a struct per reference row, so legitimately-null reference values
     don't reach further back).

One shuffle on the key — the same cost as any keyed window; no range
explosion, no per-row Python.  Ties (reference time == probe time) match,
reference-first — ``ON b.ts <= a.ts`` semantics, like DuckDB ASOF JOIN and
pandas ``merge_asof(direction='backward')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row nearest in time for the same
    ``on`` key (left-outer: unmatched probe rows keep nulls).

    ``direction``:
      * ``backward`` (default) — most recent right with rt <= lt
        (DuckDB ASOF / pandas merge_asof backward);
      * ``forward`` — earliest right with rt >= lt;
      * ``nearest`` — smaller absolute time gap; ties → backward
        (pandas merge_asof nearest semantics).

    All three run in the SAME single shuffle on the key: the union is
    sorted once per required order, backward uses a preceding window,
    forward a following window, nearest combines the two.  Ties
    (reference time == probe time) match in both directions.

    ``value_cols``: right columns to carry (default: all but key+ts);
    carried columns are suffixed on collision with left columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    out_names = {c: (c + suffix if c in left.columns else c) for c in value_cols}

    ref_struct = F.struct(*[F.col(c).alias(out_names[c]) for c in value_cols])
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        ref_struct.alias("_ref"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields],
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rt.schema["_ref"].dataType).alias("_ref"),
        *left.columns,
    )
    both = lt.unionByName(rt.select(lt.columns))

    # backward: reference rows (_tag=0) sort BEFORE probe rows at equal
    # timestamps so an exactly-equal reference matches (<= semantics).
    w_back = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # forward: probe rows sort before reference rows at equal timestamps
    # (tag desc) so the following-window still sees the equal-time ref.
    w_fwd = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    tagged_ref = F.when(F.col("_tag") == 0, F.struct(F.col("_t").alias("_rt"),
                                                     F.col("_ref").alias("_rv")))
    if direction == "backward":
        carried = both.withColumn(
            "_m", F.last(F.col("_ref"), ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        carried = both.withColumn(
            "_m", F.first(tagged_ref, ignorenulls=True).over(w_fwd)["_rv"]
        )
    else:  # nearest
        back = F.last(tagged_ref, ignorenulls=True).over(w_back)
        fwd = F.first(tagged_ref, ignorenulls=True).over(w_fwd)
        d_back = F.col("_t").cast("double") - back["_rt"].cast("double")
        d_fwd = fwd["_rt"].cast("double") - F.col("_t").cast("double")
        pick_back = fwd.isNull() | (back.isNotNull() & (d_back <= d_fwd))
        carried = both.withColumn(
            "_m", F.when(pick_back, back["_rv"]).otherwise(fwd["_rv"])
        )
    return (
        carried.where(F.col("_tag") == 1)
        .select(
            *left.columns,
            *[F.col(f"_m.{out_names[c]}").alias(out_names[c]) for c in value_cols],
        )
    )


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    *,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal interval) join: each fact row picks the
    dimension version whose validity interval covers the fact timestamp —
    ``versions.key == facts.key AND valid_from <= ts < valid_to``.

    The standard SCD2 lookup.  Physically this is a plain equi-join on the
    key with the interval predicate applied as a post-join filter inside
    the same join operator (Catalyst keeps non-equi conjuncts attached to
    the hash/sort-merge join, no cartesian anything): one shuffle on the
    key, each fact row meets only its key's versions (a handful per key in
    any real SCD2 table).  For open-ended current versions pass a far
    future ``valid_to`` rather than NULL so the predicate stays sargable.

    Contrast with ``asof_join``: as-of matches the latest EVENT at-or-
    before; point-in-time matches a maintained VERSION INTERVAL — with a
    well-formed (non-overlapping, gap-free) version table each fact gets
    exactly one match; overlaps surface as fan-out, gaps as drops (or
    null-extended rows with ``how='left'``), which is the honest behavior
    for a broken dimension rather than silently picking one.
    """
    f, v = facts.alias("__f"), versions.alias("__v")
    cond = (
        (F.col(f"__f.{key}") == F.col(f"__v.{key}"))
        & (F.col(f"__v.{valid_from}") <= F.col(f"__f.{ts_col}"))
        & (F.col(f"__f.{ts_col}") < F.col(f"__v.{valid_to}"))
    )
    return f.join(v, cond, how).drop(F.col(f"__v.{key}"))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    how: str = "inner",
) -> DataFrame:
    """General interval-overlap join: rows whose [start, end) ranges
    intersect, per key — ``l.start < r.end AND r.start < l.end``
    (half-open, so touching endpoints do NOT overlap).

    The third member of the temporal-join family: ``asof_join`` matches
    the latest event at-or-before, ``point_in_time_join`` a point against
    version intervals; this one matches intervals against intervals
    (session vs session, stay vs promotion window, downtime vs deploy).

    Physically an equi-join on the key with both range conjuncts attached
    to the join operator — one shuffle, overlap checks run only within a
    key's rows.  Without an equality key this degenerates to a range
    cross-product: bucketize the time axis first (overlap candidates
    share a bucket — the ``neighbor_join`` grid trick on one dimension).
    """
    l, r = left.alias("__l"), right.alias("__r")
    cond = (
        (F.col(f"__l.{key}") == F.col(f"__r.{key}"))
        & (F.col(f"__l.{left_start}") < F.col(f"__r.{right_end}"))
        & (F.col(f"__r.{right_start}") < F.col(f"__l.{left_end}"))
    )
    return l.join(r, cond, how).drop(F.col(f"__r.{key}"))
