#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir, runs the
matching ``oracle_sql()`` through DuckDB over the same parquet, and compares
row count + column names/dtypes + order-insensitive values.  Prints one line
per query; exits non-zero if anything mismatches.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
    """Sorted/stringified copy for tolerant compare, plus the row permutation
    so callers can align the RAW frame the same way for bit-exact checks."""
    out = df.copy().reset_index(drop=True)
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        elif s.dtype == object:
            out[c] = s.astype(str)
    out = out.sort_values(by=list(out.columns))
    order = out.index.to_numpy()
    return out.reset_index(drop=True), order


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replica of the DRIVER's canonicalization: sort the RAW frame by all
    columns (no stringify-first pass).  The driver runs this on EVERY result
    — including rows-only ones — before hashing, so any cell type pandas
    can't factorize (e.g. an ``array<double>`` column arriving as ndarray
    cells) raises here exactly as it does in the driver
    (r10 ``pca_embeddings``: ``TypeError: unhashable type: 'numpy.ndarray'``).
    Run it on rows-only results too so that class of bug fails LOCALLY."""
    out = df.copy().reset_index(drop=True)
    out = out[sorted(out.columns)]
    if len(out.columns):
        out = out.sort_values(by=list(out.columns))
    return out.reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns {s_cols} != oracle {o_cols}")
        return problems
    a, order_a = normalize(spark_pdf)
    b, order_b = normalize(oracle_pdf)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] {a[c].dtype} != oracle {b[c].dtype}")
    if not problems:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=0)
        except AssertionError as e:
            problems.append("values differ: " + str(e).splitlines()[-1])
    if not problems:
        # Bit-level float compare on the RAW (un-rounded) values, aligned by
        # the normalized sort order.  The driver's value hash is exact: a
        # 1-ulp ln()/round() divergence that 9-decimal rounding absorbs still
        # fails its hash (seen on `collocations` in r2), as do -0.0 vs 0.0
        # and NaN-payload drift.
        ra = spark_pdf.reset_index(drop=True)[sorted(spark_pdf.columns)]
        rb = oracle_pdf.reset_index(drop=True)[sorted(oracle_pdf.columns)]
        for c in a.columns:
            if pd.api.types.is_float_dtype(ra[c]) and pd.api.types.is_float_dtype(rb[c]):
                sa = ra[c].to_numpy(dtype="float64")[order_a].view("uint64")
                sb = rb[c].to_numpy(dtype="float64")[order_b].view("uint64")
                bad = np.nonzero(sa != sb)[0]
                if len(bad):
                    i = bad[0]
                    problems.append(
                        f"float bits differ in [{c}] ({len(bad)} rows, e.g. "
                        f"{ra[c].to_numpy()[order_a][i]!r} vs "
                        f"{rb[c].to_numpy()[order_b][i]!r})"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from smartpy_arc_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        # Driver-style canonicalization on EVERY result, rows-only included:
        # the driver sorts/hashes the raw frame before the rows-only
        # short-circuit, so a frame it can't canonicalize is a FAIL even
        # when no oracle exists (r10 pca_embeddings).
        try:
            driver_canon(spark_pdf)
        except Exception as e:
            print(f"FAIL  {name}: driver canonicalization would crash: "
                  f"{type(e).__name__}: {e} [{time.time()-t0:.1f}s]")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")

    if not only:
        missing = [k for k in oracles if k not in qs]
        if missing:
            print(f"WARN: oracle entries without queries: {missing}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
