"""Sequence packing: plan documents into fixed-capacity context windows.

LLM pretraining batches concatenate documents into fixed-length token
windows; packing quality (fill ratio) directly buys training throughput.
Optimal bin packing is NP-hard and inherently sequential, so the scale
play is *bucketed* first-fit-decreasing: documents are hashed into
independent buckets, and FFD runs per bucket in an Arrow-batched
grouped-map.  Buckets are embarrassingly parallel — 100 TB is just more
buckets — and FFD within a bucket is O(m log m) on that bucket's docs.
Fill ratio loses only O(1/bucket_size) vs global FFD.

No counterpart in the reference repo; LLM-pipeline extension surface
(SURVEY.md §7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    length_col: str = "n_tokens",
    max_len: int = 2048,
    num_buckets: int = 64,
) -> DataFrame:
    """Assign every document to a (bucket, bin) so that each bin's total
    length is <= ``max_len``.

    Returns ``<id_col>, <length_col>, bucket, bin_in_bucket, bin_fill,
    truncated`` — one row per input document.  A document longer than
    ``max_len`` gets a dedicated bin with ``truncated=true`` (the caller
    decides whether to split or drop it).

    Deterministic: bucket is a hash of the id (crc32 — engine-portable,
    unlike xxhash64), and FFD within a bucket sorts by (length desc,
    id asc), so the same inputs always produce the same plan.
    """
    if max_len <= 0:
        raise ValueError("max_len must be positive")

    bucketed = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(length_col).cast("long").alias("length"),
        (F.crc32(F.col(id_col).cast("string")) % num_buckets)
        .cast("int")
        .alias("bucket"),
    )

    schema = (
        "doc_id long, length long, bucket int, "
        "bin_in_bucket long, bin_fill long, truncated boolean"
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["length", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assignment = []
        for length in pdf["length"]:
            eff = min(int(length), max_len)
            # first fit over open bins (linear scan; bins stay few because
            # FFD opens a new bin only when nothing fits)
            for b, fill in enumerate(fills):
                if fill + eff <= max_len:
                    fills[b] = fill + eff
                    assignment.append(b)
                    break
            else:
                fills.append(eff)
                assignment.append(len(fills) - 1)
        pdf["bin_in_bucket"] = pd.Series(assignment, dtype="int64")
        pdf["bin_fill"] = pdf["bin_in_bucket"].map(lambda b: fills[b]).astype("int64")
        pdf["truncated"] = pdf["length"] > max_len
        return pdf[
            ["doc_id", "length", "bucket", "bin_in_bucket", "bin_fill", "truncated"]
        ]

    out = bucketed.groupBy("bucket").applyInPandas(ffd, schema=schema)
    if id_col != "doc_id" or length_col != "length":
        out = out.withColumnsRenamed({"doc_id": id_col, "length": length_col})
    return out
