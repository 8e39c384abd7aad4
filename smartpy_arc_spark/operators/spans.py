"""Substring-level duplicate-span detection (cross-document n-gram islands).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022, arXiv:2107.06499) removes *substrings* duplicated across
documents, not just whole near-duplicate documents.  The exact method
builds a corpus-wide suffix array; the standard scalable surrogate —
used here — detects maximal runs of word ``n``-grams that occur in more
than one document and merges them into character-free token spans:

  1. enumerate word ``n``-grams with their token position per document;
  2. one hash-aggregate finds grams whose distinct-document count > 1;
  3. join back (semi) to keep only duplicated positions;
  4. per document, merge overlapping/adjacent duplicated windows into
     maximal islands via a lag-window (gap > 1 token starts a new span).

Output: one row per duplicated span ``(doc_id, span_start, span_end,
span_tokens)`` with 1-based inclusive token positions — the caller cuts
or masks those token ranges.

Scale design (100 TB):
- Exploding to (doc, pos, gram) rows is the suffix-array trade: linear
  blow-up (~n_tokens rows/doc) instead of a global sorted structure, and
  every step after the explode is a hash shuffle on either the gram hash
  or ``doc_id`` — no global sort, no driver state.
- Grams travel as 64-bit ``xxhash64`` values after step 1, so shuffle
  width is (doc_id, pos, int64), not raw strings.
- The duplicated-gram table is NOT assumed broadcastable (at corpus
  scale it is huge); the join back is a plain shuffled semi-join on the
  hash.  Catalyst/AQE may still pick broadcast when small.
- The island merge is one window per ``doc_id`` — state is a single lag
  value, and partitioning by document bounds every partition's work.

No counterpart in the reference repo; part of the LLM-training-data
extension surface (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal token spans covered by word ``n``-grams appearing in at
    least ``min_docs`` distinct documents.

    Returns ``(id_col, span_start, span_end, span_tokens)`` — 1-based
    inclusive token positions, ``span_tokens = span_end - span_start + 1``.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")

    # tokenizer staged behind a projection boundary: slice() inside the
    # transform lambda re-evaluates its input expression per index (no
    # CSE in HOF lambdas) — staging keeps gram extraction O(len) per doc
    toks = F.filter(F.split(F.col(text_col), r"\s+", -1), lambda t: t != F.lit(""))
    staged = df.select(F.col(id_col), toks.alias("_toks"))
    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            # hash immediately: positions shuffle as int64, never strings
            lambda i: F.xxhash64(F.array_join(F.slice(tk, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    pos = staged.select(
        F.col(id_col), F.posexplode(grams).alias("pos0", "gram_h")
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gram_h")

    dup_grams = (
        pos.groupBy("gram_h")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("gram_h")
    )

    dup_pos = pos.join(dup_grams, "gram_h", "left_semi").select(id_col, "pos")

    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup_pos.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            # islands break when the NEXT duplicated window leaves an
            # uncovered token: window at `prev` covers prev..prev+n-1, so
            # any start within prev+n still touches/overlaps that range.
            # Breaking on gap > 1 (a prior bug, caught by the hypothesis
            # invariant sweep) emitted OVERLAPPING spans for gaps in
            # (1, n) and split touching coverage into adjacent spans.
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > n), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Apply the cut: re-emit each document with its duplicated spans
    removed (the second half of the Lee et al. pipeline — detect, then
    drop the repeated substring, keeping the first/last tokens around it).

    Join shape: spans aggregate to ONE array row per affected document
    (bounded: spans are disjoint islands, so |spans| <= n_tokens), then a
    row-local HOF filter drops tokens whose position falls inside any
    span.  Documents with no duplicated span pass through unchanged via
    the left join.  One extra shuffle over ``duplicate_spans`` (the join
    back on ``id_col``).

    Returns ``(id_col, clean_text, n_tokens, n_removed)``.
    """
    spans = (
        duplicate_spans(
            df, id_col=id_col, text_col=text_col, n=n, min_docs=min_docs
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
            ).alias("__spans")
        )
    )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+", -1), lambda t: t != F.lit("")
    )
    with_spans = df.join(spans, id_col, "left").withColumn("__toks", toks)
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.coalesce(
                F.col("__spans"),
                F.array().cast("array<struct<s:int,e:int>>"),
            ),
            # positions are 1-based in duplicate_spans; filter's i is 0-based
            lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
        ),
    )
    return with_spans.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).alias("n_removed"),
    )
