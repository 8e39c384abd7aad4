"""Text analysis operators for training-data pipelines.

All pure built-in column expressions (JVM-side, whole-stage codegen) —
no Python in the hot path, so these run at parquet-scan speed and scale
linearly with partitions; there is no shuffle in any per-document op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql import types as T

# BPE-ish word/number/punct tokenizer (kept free of \s so the same pattern
# behaves identically under Java regex and RE2-style engines).
DEFAULT_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Marker stopwords per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}


def text_stats(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: char count, whitespace token count, average token
    length."""
    text = F.col(text_col)
    n_tokens = F.size(F.split(text, " ", -1))
    return df.select(
        id_col,
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(text, " ", "")) * F.lit(1.0) / n_tokens, 4
        ).alias("avg_token_len"),
    )


def regex_token_count(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = DEFAULT_TOKEN_PATTERN,
) -> DataFrame:
    """Token count under a BPE-ish regex tokenizer."""
    return df.select(
        id_col,
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).alias(
            "n_tokens"
        ),
    )


def fingerprint(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprint: md5 of the lowercased, de-spaced content —
    a cheap canonical-form hash for exact-after-normalization dedup."""
    norm = F.lower(F.regexp_replace(F.col(text_col), " ", ""))
    return df.select(id_col, F.md5(norm.cast(T.BinaryType())).alias("fingerprint"))


def _count_occurrences(text: Column, word: str) -> Column:
    """Exact whole-token occurrence count: split on spaces and count equal
    tokens.  (The padded-substring-replace trick undercounts adjacent
    repeats — ' the the ' counts 1 because the replace consumes the shared
    space; token filtering has no such overlap problem and mirrors exactly
    in any engine with list filtering.)"""
    tokens = F.split(text, " ", -1)
    return F.size(F.filter(tokens, lambda t: t == F.lit(word)))


def lang_id_heuristic(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-marker language ID: score each language by marker-word hits,
    predict the argmax (ties broken by language code order).  A deterministic
    heuristic — real pipelines swap in fastText et al. via a pandas UDF."""
    markers = markers or LANG_MARKERS
    text = F.lower(F.col(text_col))
    scores = [
        sum(
            (_count_occurrences(text, w) for w in words),
            start=F.lit(0),
        ).alias(f"score_{lang}")
        for lang, words in sorted(markers.items())
    ]
    scored = df.select(id_col, *scores)
    langs = sorted(markers)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.withColumn("predicted_lang", pred)


def quality_score(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite document-quality score from length / punctuation / stopword
    ratios (each component in [0,1])."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    n_tokens = F.size(F.split(text, " ", -1))
    stop_hits = sum(
        (_count_occurrences(F.lower(text), w) for w in LANG_MARKERS["en"]),
        start=F.lit(0),
    )
    alpha_ratio = n_alpha * F.lit(1.0) / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct * F.lit(1.0) / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits * F.lit(1.0) / F.greatest(n_tokens, F.lit(1))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * length_score
        + F.lit(0.1) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return df.select(
        id_col,
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def rolling_hash_fingerprint(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    portable_hash: bool = False,
) -> DataFrame:
    """Winnowing-style fingerprint: min hash over character shingles —
    a robust near-canonical document signature computed with built-ins
    (sequence → transform → substring → min over hashes).

    ``portable_hash=True`` swaps xxhash64 for the md5-derived
    ``portable_hash64`` so the signature is reproducible in any engine
    (the oracle mode); the default xxhash64 stays the production fast
    path — the winnowing logic is hash-family-agnostic either way."""
    from smartpy_arc_spark.functions.scalar import portable_hash64

    text = F.col(text_col)
    n = F.greatest(F.length(text) - F.lit(window - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(text, i, window)
    )
    hfn = portable_hash64 if portable_hash else F.xxhash64
    hashes = F.transform(shingles, lambda s: hfn(s))
    return df.select(
        id_col,
        F.array_min(hashes).alias("min_shingle_hash"),
        F.array_max(hashes).alias("max_shingle_hash"),
    )


def alpha_tokens(text: Column) -> Column:
    """Lowercased alphabetic word tokens: split on non-letter runs, empties
    dropped (Java split keeps boundary empties; RE2-style engines do not —
    filtering makes the tokenization engine-portable)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z]+", -1), lambda t: t != F.lit("")
    )


def wordcount_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Corpus-level word count, deterministic top-k (count desc, word asc).

    The explode → groupBy is the canonical map-side-combinable aggregation:
    partial counts per partition, one shuffle on the word key, then a
    driver-cheap global top-k via the sorted limit."""
    # explode_outer avoids the Generate pre-filter double-evaluating the
    # tokenizer expression (empty-token-array rows drop via the null filter)
    tokens = df.select(
        F.explode_outer(alpha_tokens(F.col(text_col))).alias("word")
    ).where(F.col("word").isNotNull())
    return (
        tokens.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-N terms by tf·idf (idf = ln(N/df), raw tf).

    Three shuffles total — (doc,term) tf, term df, and the per-doc window —
    each on a bounded key space; the corpus size N joins in as a broadcast
    1-row aggregate, so nothing is collected on the driver."""
    from pyspark.sql import Window as W

    tokens = df.select(
        F.col(id_col), F.explode_outer(alpha_tokens(F.col(text_col))).alias("term")
    ).where(F.col("term").isNotNull())
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = (
        tokens.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .join(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df_t"))).alias("_tfidf"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("_tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select(id_col, "rk", "term", F.round("_tfidf", 6).alias("tfidf"))
    )


def collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    raw_pmi: bool = False,
) -> DataFrame:
    """Adjacent-bigram collocation mining with PMI scoring.

    ``raw_pmi=True`` returns the unrounded double (callers that need a
    cross-engine bit-stable representation rescale it themselves); the
    default keeps the human-friendly 4-decimal rounding.

    Classic corpus analysis (phrase detection a la word2vec's phrase
    pass): count adjacent token pairs, score each against its parts'
    unigram frequencies with pointwise mutual information

        pmi = ln( (c12 / N2) / ((c1 / N1) * (c2 / N1)) )

    Three bounded-key aggregations (bigrams, unigrams, two scalar
    totals); the unigram table joins back by each side of the pair —
    vocabulary-sized, so both joins broadcast at any corpus scale.  All
    expressions built-in; zero Python in the hot path.
    """
    toks = F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != F.lit(""))
    base = df.select(toks.alias("w"))

    pairs = base.select(
        F.explode_outer(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("w1"),
                        F.element_at("w", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).where(F.col("p").isNotNull())
    # r11 (guide §2.1/§5): the scalar totals used to come from separate
    # unigrams.count()/pairs.count() jobs — two MORE full
    # tokenize-explode passes on top of the two aggregation passes, and
    # the un-materialized uni_counts re-ran its explode under each of
    # the two broadcast joins below.  Materialize the two
    # vocabulary-sized count tables once and derive the totals from
    # them: #exploded tokens ≡ Σ c and #pair rows ≡ Σ n_pair, exactly.
    pair_counts = (
        pairs.groupBy("p.w1", "p.w2")
        .agg(F.count("*").alias("n_pair"))
        .localCheckpoint(eager=True)
    )
    uni_counts = (
        base.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    n1 = uni_counts.agg(F.sum("c").cast("long").alias("n")).first()["n"] or 0
    n2 = (
        pair_counts.agg(F.sum("n_pair").cast("long").alias("n")).first()["n"]
        or 0
    )

    scored = (
        pair_counts.where(F.col("n_pair") >= min_count)
        .join(
            F.broadcast(uni_counts.select(F.col("t").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni_counts.select(F.col("t").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
    )
    pmi = F.log(
        (F.col("n_pair") / F.lit(float(n2)))
        / ((F.col("c1") / F.lit(float(n1))) * (F.col("c2") / F.lit(float(n1))))
    )
    if raw_pmi:
        return scored.select("w1", "w2", "n_pair", pmi.alias("pmi"))
    # ``+ 0.0`` collapses IEEE -0.0 to +0.0 so the value is byte-stable
    # across engines (DuckDB's round can yield -0.0 where the JVM's doesn't).
    return scored.select(
        "w1", "w2", "n_pair", (F.round(pmi, 4) + F.lit(0.0)).alias("pmi")
    )


def inverted_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Build an inverted index: one row per term with document frequency,
    total term frequency, and a doc-ordered postings string
    ``"doc:tf doc:tf ..."`` — the retrieval-engine primitive, built as
    two hash aggregates (term-doc, then term).

    Postings serialize to a canonical string (sorted by doc id) rather
    than a nested array so the result is order-insensitive-comparable in
    any engine.  At 100 TB the term key is Zipf-skewed: AQE's skew
    handling splits the hot stopword partitions, and ``min_df`` prunes
    the hapax tail (typically >40% of vocab) before the second shuffle.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda t: t != F.lit("")
    )
    term_doc = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    return (
        term_doc.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("doc_freq"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(id_col), F.col("tf")))
                    ),
                    lambda s: F.concat_ws(":", s[id_col], s["tf"]),
                ),
                " ",
            ).alias("postings"),
        )
        .where(F.col("doc_freq") >= min_df)
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 ranking of documents against a bag-of-terms query (Robertson
    & Walker's Okapi formula, the retrieval baseline every engine ships).

    score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))·(k1+1),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).

    Shape: one aggregate for per-doc lengths and query-term tfs (the
    term filter prunes before the shuffle), corpus stats (N, avgdl) and
    per-term dfs are 1-row/|q|-row broadcasts.  Nothing touches the
    corpus twice; no Python in the plan.
    """
    terms = [t.lower() for t in query_terms]
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda t: t != F.lit("")
    )
    docs = df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, F.size("__toks").alias("dl"), "__toks"
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = docs.select(
        id_col,
        "dl",
        F.explode(
            F.filter(F.col("__toks"), lambda t: t.isin(*terms))
        ).alias("term"),
    ).groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count_distinct(id_col).cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_terms_hit"),
            (F.round(F.sum("contrib"), 4) + F.lit(0.0)).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(top_k)


def vocabulary_coverage(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 100,
) -> DataFrame:
    """Per-document coverage against the corpus's own top-``vocab_size``
    vocabulary: what fraction of a document's tokens would an OOV-free
    tokenizer with that vocabulary cover?

    The curation signal behind "does a fixed subword/word vocab fit this
    slice" — documents with high OOV rates are disproportionately noise,
    code, or the wrong language.

    Vocabulary = top terms by corpus frequency with deterministic
    (count DESC, term ASC) tiebreak.  It is vocab-sized, so it rides to
    every executor as one broadcast equi-join on the exploded token —
    never a per-row linear probe of an array literal.  Two shuffles
    total (vocab build, per-doc regroup); tokens never leave the JVM.

    Returns ``(id, n_tokens, n_oov, oov_rate)`` — ``oov_rate`` is one
    exact-integer division (bit-stable; no rounding needed).
    """
    toks = F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != F.lit(""))
    exploded = df.select(
        F.col(id_col), F.explode(toks).alias("t")
    )
    vocab = (
        exploded.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(vocab_size)
        .select("t", F.lit(True).alias("__in_vocab"))
    )
    marked = exploded.join(F.broadcast(vocab), "t", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.count(F.when(F.col("__in_vocab").isNull(), 1))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "n_oov",
            (
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("oov_rate"),
        )
    )


def source_similarity(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise cosine similarity between per-group term-frequency
    vectors — the corpus-drift / source-overlap profile ("which sources
    publish the same language?").

    The vectors are never materialized dense: group term counts stay as
    sparse (group, term, tf) rows, the pairwise dot products come from
    ONE self-join keyed by term (each term contributes its groups'
    cross products — bounded by groups-per-term, not vocabulary), and
    the norms from a per-group aggregate broadcast onto the (bounded,
    #groups²/2) pair table.  Dot products and squared norms are exact
    integer sums; cosine is exposed as integer millionths.

    Returns ``(group_a, group_b, dot, cos_e6)`` with group_a < group_b.
    """
    # the sparse TF table (bounded by groups × vocabulary) feeds the
    # norms aggregate and both self-join sides — materialize once so the
    # corpus tokenize/explode pass runs once, not 3× (r11, guide §2.4)
    tf = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(alpha_tokens(F.col(text_col))).alias("t"),
        )
        .groupBy("g", "t")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    norms = tf.groupBy("g").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("ss")
    )
    a, b = tf.alias("a"), tf.alias("b")
    dots = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.g") < F.col("b.g")))
        .groupBy(F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("g").alias("group_a"), F.col("ss").alias("ssa"))
    nb = norms.select(F.col("g").alias("group_b"), F.col("ss").alias("ssb"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("ssa").cast("double")) * F.sqrt(F.col("ssb").cast("double"))
    )
    return (
        dots.join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .select(
            "group_a",
            "group_b",
            "dot",
            F.round(cos * 1000000).cast("long").alias("cos_e6"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = True,
) -> DataFrame:
    """Cross-corpus novelty: the fraction of a document's distinct word
    n-grams that appear in NO other document — high novelty marks
    original text worth keeping, low novelty marks boilerplate and
    near-template content (the memorization/diversity signal of a
    training-data audit).

    Plan: explode distinct (doc, gram) pairs once, one hash aggregate on
    the gram for document frequency, join the bounded df table back, one
    aggregate per doc — TF-IDF's exact shuffle shape (gram-keyed, never
    doc×doc).  Returns ``(id, n_grams, n_unique, novelty_e6)`` with the
    ratio in integer millionths (one exact division per row).

    ``hash_grams=True`` (default) xxhash64-compresses each gram to int64
    BEFORE the gram-keyed exchange, so the shuffle carries 8-byte keys
    instead of ~25-byte n-gram strings — the dominant cost at scale is
    that exchange.  Document-frequency counts are identical unless two
    distinct corpus grams collide in 64 bits (~m²/2⁶⁵; immaterial below
    trillions of grams, and deterministic for a given corpus), so the
    exact-oracle contract still holds on test data.
    """
    from pyspark.sql import Window

    # STAGE the token array as a real column before indexing into it:
    # element_at over the raw split/filter EXPRESSION re-evaluates the
    # whole tokenization per accessed element (no common-subexpression
    # elimination inside the lambda), which is O(len²) per document —
    # measured 14.7 s → 0.7 s at sf0.1 from this one projection boundary
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1),
        lambda t: t != F.lit(""),
    )
    staged = df.select(F.col(id_col), toks.alias("_toks"))
    tk = F.col("_toks")
    grams = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.array_distinct(grams)
    if hash_grams:
        # 8-byte shuffle keys: one xxhash64 per distinct gram, applied
        # inside the array pre-explode so the exchange never sees strings
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    doc_grams = staged.select(F.col(id_col), F.explode(grams).alias("g"))
    # document frequency as a window over the gram partition: ONE
    # shuffle on the gram and one pass over the (expensive) explode —
    # the aggregate+join formulation re-computed the gram extraction
    # on both sides (measured 23 s → 9 s at sf0.1)
    with_df = doc_grams.withColumn(
        "df", F.count("*").over(Window.partitionBy("g"))
    )
    return (
        with_df
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
        .withColumn(
            "novelty_e6",
            F.round(
                F.col("n_unique").cast("double")
                / F.col("n_grams").cast("double")
                * 1000000
            ).cast("long"),
        )
    )


RAKE_STOPWORDS = (
    "the a an and or of to in is on for with as by at be this that it "
    "from are was were has have had not but if then else when"
).split()


def rake_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 20,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    the token runs between stopwords; each word scores
    ``degree/frequency`` (degree = co-occurring words incl. itself,
    summed over the word's phrase occurrences) and a phrase scores the
    sum of its words' scores.

    Portability: word scores are rounded to integer millionths BEFORE
    the phrase sum, so every aggregate is an order-free integer sum —
    no float accumulation order anywhere.  Plan: explode phrases → one
    phrase-keyed aggregate, explode words → one word-keyed aggregate,
    broadcast-join the (bounded) word-score table back, top-k via
    TakeOrdered.  Returns ``(phrase, n_occurrences, score_e6)``.
    """
    sw = stopwords or RAKE_STOPWORDS
    boundary = r"\b(?:" + "|".join(sw) + r")\b"
    phrases = (
        df.select(
            F.explode(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), boundary, "|"), r"\|")
            ).alias("raw")
        )
        .select(F.trim(F.regexp_replace(F.col("raw"), r"\s+", " ")).alias("phrase"))
        .where(F.col("phrase") != "")
    )
    occ = phrases.withColumn("words", F.split(F.col("phrase"), " "))
    word_stats = (
        occ.select(F.col("words"), F.explode("words").alias("w"))
        .groupBy("w")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum(F.size("words")).cast("long").alias("degree"),
        )
        .withColumn(
            "w_score_e6",
            F.round(
                F.col("degree").cast("double")
                * 1000000
                / F.col("freq").cast("double")
            ).cast("long"),
        )
    )
    phrase_words = (
        occ.groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.first("words").alias("words"),
        )
        .select("phrase", "n_occurrences", F.explode("words").alias("w"))
    )
    scored = (
        phrase_words.join(F.broadcast(word_stats.select("w", "w_score_e6")), "w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("w_score_e6").cast("long").alias("score_e6"))
    )
    return scored.orderBy(F.desc("score_e6"), F.col("phrase")).limit(top_k)


def char_entropy(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document character-distribution Shannon entropy (nats) — the
    gibberish/keyboard-mash detector: natural prose sits in a narrow
    entropy band, while repeated-char padding scores near 0 and random
    byte soup scores near ln(alphabet).

    Plan: explode characters → one (doc, char) hash aggregate → one
    per-doc aggregate.  Each ``−p·ln p`` term is pre-rounded to integer
    nanonats so the per-doc sum is order-free (the ``rake_keywords`` /
    ``mutual_information`` portability pattern).

    Returns ``(id, n_chars, n_distinct_chars, entropy_e9)``.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "", -1)).alias("ch"),
    ).where(F.col("ch") != "")
    counts = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    totals = counts.groupBy(id_col).agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(-p * F.log(p) * 1e9).cast("long")
    return (
        counts.join(totals, id_col)
        .select(F.col(id_col), F.col("n"), term.alias("t"))
        .groupBy(id_col, "n")
        .agg(
            F.count("*").cast("long").alias("n_distinct_chars"),
            F.sum("t").cast("long").alias("entropy_e9"),
        )
        .select(
            id_col,
            F.col("n").cast("long").alias("n_chars"),
            "n_distinct_chars",
            "entropy_e9",
        )
    )


def zipf_slope(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law slope of the corpus word-frequency distribution: OLS
    of ``ln(freq)`` on ``ln(rank)`` over the ``top_n`` words — natural
    corpora slope near −1; machine-generated or templated text bends
    away.  A one-number corpus-health check.

    Distributed: one word-count aggregate; ranking the bounded top-n is
    a TakeOrdered; each (ln rank, ln freq) pair is pre-rounded to
    integer nanounits so the OLS moment sums are order-free integer
    aggregates (the closed-form slope then runs in one deterministic
    1-row combine).

    Returns one row ``(n_words, slope_e6, intercept_e6)``.
    """
    words = (
        df.select(F.explode(alpha_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .orderBy(F.desc("f"), F.col("w"))
        .limit(top_n)
    )
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.desc("f"), F.col("w"))
    pts = words.withColumn("r", F.row_number().over(w_rank)).select(
        F.round(F.log(F.col("r").cast("double")) * 1e9)
        .cast("long")
        .alias("x_e9"),
        F.round(F.log(F.col("f").cast("double")) * 1e9)
        .cast("long")
        .alias("y_e9"),
    )
    agg = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x_e9").cast("decimal(38,0)").alias("sx"),
        F.sum("y_e9").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x_e9").cast("decimal(38,0)") * F.col("y_e9")).alias("sxy"),
        F.sum(F.col("x_e9").cast("decimal(38,0)") * F.col("x_e9")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    # degenerate vocabulary (<2 distinct words): no line to fit
    slope = F.when(denom > 0, (n * sxy - sx * sy) / denom)
    intercept = (sy - slope * sx) / n / 1e9
    return agg.select(
        F.col("n").alias("n_words"),
        F.round(slope * 1000000).cast("long").alias("slope_e6"),
        F.round(intercept * 1000000).cast("long").alias("intercept_e6"),
    )


def textrank_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): build
    the corpus-wide word co-occurrence graph (adjacent-token edges,
    stopwords removed) and rank words by PageRank over it — the graph
    reuses :func:`smartpy_arc_spark.operators.components.pagerank`, so
    the iteration is the same distributed power method with dangling
    redistribution used for the link graph.

    Graph construction is one staged-tokens pass + a distinct on edges
    (word-keyed shuffle); corpus size only affects edge WEIGHT discovery,
    the node set is the vocabulary.  Deterministic: fixed iteration
    count, uniform init, smallest-word tie-break on rank ties.

    Returns the ``top_k`` rows ``(word, rank_e9)``.
    """
    from smartpy_arc_spark.operators.components import pagerank

    stop = set(RAKE_STOPWORDS)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1),
        lambda t: (t != F.lit("")) & ~t.isin(*stop),
    )
    staged = df.select(toks.alias("_toks"))
    tk = F.col("_toks")
    pairs = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("a"),
                F.element_at(tk, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    edges = (
        staged.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("src"), F.col("p.b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    und = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # portable_sum: the rank-contribution sums fold in sorted order so
    # the e9-rounded values are bit-stable across engines and runs (the
    # vocabulary graph is small enough that per-node contribution lists
    # are cheap); see pagerank's docstring
    ranks = pagerank(
        und, iterations=iterations, damping=damping, portable_sum=True,
        assume_distinct=True,  # und ends in .distinct() above
    )
    return (
        ranks.select(
            F.col("node").alias("word"),
            F.round(F.col("rank") * 1e9).cast("long").alias("rank_e9"),
        )
        .orderBy(F.desc("rank_e9"), "word")
        .limit(top_k)
    )


def nb_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    alpha_num: int = 1,
) -> DataFrame:
    """Train a multinomial Naive Bayes text classifier: per-(label, token)
    counts plus per-label totals — the CCNet-style cheap quality/language
    classifier a corpus pipeline trains in one pass.

    The "model" IS a DataFrame (``label, token, n_tok, n_label_tokens,
    n_label_docs, n_docs, vocab``) — it persists as a table, broadcasts
    for scoring, and is exact integer counts so training is
    engine-reproducible.  One explode + two hash aggregates.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda t: t != F.lit("")
    )
    pairs = df.select(F.col(label_col).alias("label"), toks.alias("_toks"))
    exploded = pairs.select("label", F.explode("_toks").alias("token"))
    # ONE pass over the exploded corpus; every other statistic (label
    # totals, vocabulary size) derives from the far smaller counts table
    counts = exploded.groupBy("label", "token").agg(
        F.count("*").cast("long").alias("n_tok")
    ).localCheckpoint(eager=True)
    label_tot = counts.groupBy("label").agg(
        F.sum("n_tok").cast("long").alias("n_label_tokens")
    )
    label_docs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").cast("long").alias("n_label_docs")
    )
    n_docs = df.count()
    vocab = counts.select("token").distinct().count()
    return (
        counts.join(label_tot, "label")
        .join(label_docs, "label")
        .withColumn("n_docs", F.lit(n_docs))
        .withColumn("vocab", F.lit(vocab))
        .withColumn("alpha_num", F.lit(alpha_num))
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a :func:`nb_train` model: predicted label =
    argmax over labels of ``log P(label) + Σ_tokens log P(token|label)``
    (Laplace-smoothed; unseen tokens fall back to the smoothing floor).

    Plan shape is DSIR's: explode document tokens, broadcast-join the
    (label, token) weight table, ONE groupBy(doc, label) partial-sum and
    a per-doc argmax — the corpus is never shuffled by anything wider
    than the doc id.  Ties break to the lexicographically smallest
    label, so predictions are deterministic.

    Exactness (round 6): every log term pre-rounds ONCE to integer
    nanonats (e9), so per-document totals are exact bigint sums —
    order-free across partitions and bit-identical in any engine that
    rounds the same double logs (the ``mutual_information`` nanonat
    contract).  The argmax and margin are therefore exact integer
    comparisons, not float ones.

    Returns ``(id, predicted_label, margin_e6)`` where margin is the
    log-likelihood gap to the runner-up (confidence proxy), in integer
    micronats (``diff_e9 div 1000``).
    """
    labels = model.select(
        "label", "n_label_tokens", "n_label_docs", "n_docs", "vocab", "alpha_num"
    ).distinct()
    weights = model.select(
        "label", "token",
        F.round(
            (
                F.log(
                    (F.col("n_tok") + F.col("alpha_num")).cast("double")
                    / (F.col("n_label_tokens")
                       + F.col("alpha_num") * F.col("vocab")).cast("double")
                )
                - F.log(
                    F.col("alpha_num").cast("double")
                    / (F.col("n_label_tokens")
                       + F.col("alpha_num") * F.col("vocab")).cast("double")
                )
            ) * 1e9
        ).cast("long")
        .alias("w_gain"),  # nanonat log-lift of a SEEN token over the floor
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+", -1), lambda t: t != F.lit("")
    )
    staged = df.select(F.col(id_col), toks.alias("_toks"))
    exploded = staged.select(
        F.col(id_col), F.size("_toks").alias("_n"), F.explode("_toks").alias("token")
    )
    # per-(doc, label) sum of seen-token log-lifts; docs × labels base
    # score (prior + all-unseen floor) joins in from the bounded label dim
    seen = (
        exploded.join(F.broadcast(weights), "token")
        .groupBy(id_col, "label")
        .agg(F.sum("w_gain").alias("gain"))
    )
    base = (
        staged.select(F.col(id_col), F.size("_toks").alias("_n"))
        .crossJoin(
            F.broadcast(
                labels.select(
                    "label",
                    F.round(
                        F.log(
                            F.col("n_label_docs").cast("double")
                            / F.col("n_docs").cast("double")
                        ) * 1e9
                    ).cast("long").alias("prior"),
                    F.round(
                        F.log(
                            F.col("alpha_num").cast("double")
                            / (F.col("n_label_tokens")
                               + F.col("alpha_num") * F.col("vocab")).cast("double")
                        ) * 1e9
                    ).cast("long").alias("floor"),
                )
            )
        )
        .select(
            id_col, "label",
            (F.col("prior") + F.col("_n") * F.col("floor")).alias("base"),
        )
    )
    scored = (
        base.join(seen, [id_col, "label"], "left")
        .select(
            id_col, "label",
            (F.col("base") + F.coalesce("gain", F.lit(0))).alias("ll"),
        )
    )
    # bounded per-doc list: one struct per LABEL (languages — a handful),
    # sorted ascending on (-ll, label) so rank 0 is the max-likelihood
    # label with ties broken to the lexicographically smallest label
    top2 = scored.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("ll")).alias("nll"), F.col("label")))
        ).alias("ranked"),
    )
    return top2.select(
        F.col(id_col),
        F.col("ranked")[0]["label"].alias("predicted_label"),
        # exact integer gap in nanonats, floor-divided to micronats
        # (diff >= 0, so floor == div == //; mirrors SQL integer //)
        F.floor(
            (F.coalesce(
                F.col("ranked")[1]["nll"], F.col("ranked")[0]["nll"]
            ) - F.col("ranked")[0]["nll"]) / F.lit(1000)
        ).cast("long").alias("margin_e6"),
    )


def readability(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease per document — the classical text-quality
    signal next to the length/punctuation ratios of ``quality_score``:
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``
    with a vowel-group syllable heuristic.

    All three counts are ``regexp_extract_all`` sizes (identical RE2/
    Java semantics for these character-class patterns), the score is
    two divisions in fixed order — bit-portable, map-only, codegen.

    Returns ``(doc_id, n_words, n_sentences, n_syllables, flesch_e3)``
    (NULL score for empty documents).
    """
    t = F.col(text_col)
    words = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), F.lit(0)))
    sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    sylls = F.size(
        F.regexp_extract_all(t, F.lit(r"[aeiouyAEIOUY]+"), F.lit(0))
    )
    base = df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (
            F.col("n_syllables").cast("double")
            / F.col("n_words").cast("double")
        )
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") > 0, F.round(score * 1000).cast("long"))
        .alias("flesch_e3"),
    )


def bigram_suggest(
    df: DataFrame, text_col: str, *, top_k: int = 3, min_count: int = 2
) -> DataFrame:
    """Next-word suggestion table: for each head word, the top-k
    following words by bigram count with conditional probability — the
    queryable core of a count-based bigram LM (autocomplete /
    boilerplate detection).

    One tokenize-explode pass (lowercased whitespace words), one
    (head, next) hash aggregate, per-head totals over the same
    partitioning, deterministic rank (count desc, word asc).
    Conditional probabilities are one exact-integer division each.

    Returns ``(head, next_word, n_pair, n_head, rank, p_e6)``.
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    toks = df.select(
        F.filter(words, lambda w: w != "").alias("w")
    ).where(F.size("w") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.slice(F.col("w"), 1, F.size("w") - 1),
                lambda head, i: F.struct(
                    head.alias("head"),
                    F.element_at(F.col("w"), i + 2).alias("nxt"),
                ),
            )
        ).alias("p")
    ).select("p.head", "p.nxt")
    counts = pairs.groupBy("head", "nxt").agg(
        F.count("*").cast("long").alias("n_pair")
    )
    wh = W.partitionBy("head")
    ranked = counts.select(
        "head",
        "nxt",
        "n_pair",
        F.sum("n_pair").over(wh).cast("long").alias("n_head"),
        F.row_number()
        .over(wh.orderBy(F.col("n_pair").desc(), F.col("nxt")))
        .alias("rank"),
    )
    return (
        ranked.where(
            (F.col("rank") <= top_k) & (F.col("n_pair") >= min_count)
        )
        .select(
            "head",
            F.col("nxt").alias("next_word"),
            "n_pair",
            "n_head",
            "rank",
            F.round(
                F.col("n_pair").cast("double")
                / F.col("n_head").cast("double")
                * 1e6
            )
            .cast("long")
            .alias("p_e6"),
        )
    )


def heaps_law(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_checkpoints: int = 20,
) -> DataFrame:
    """Heaps-law vocabulary growth fit ``V(n) = K·n^β``: how fast does
    the corpus vocabulary grow with token count?  β ≈ 0.5 for natural
    text; β near 1 screams boilerplate-free/unique ids, β near 0
    duplication — a corpus-health scaling diagnostic.

    Distributed shape: one tokenize-explode pass; each word keeps its
    FIRST occurrence position (min global token index via exact
    per-document token offsets from ``partitioned_cumsum``); checkpoint
    vocabulary sizes are one bounded cumulative pass; the log-log OLS
    fit runs over ≤ ``n_checkpoints`` exact integer pairs (ln of exact
    integers — the engine-portable transcendental discipline of
    ``mutual_information``).

    Returns one row ``(n_tokens, vocab, beta_e6, log_k_e6)``.
    """
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    docs = df.select(
        F.col(id_col).alias("doc"), words.alias("w")
    ).where(F.size("w") > 0)
    sized = docs.select("doc", "w", F.size("w").alias("len"))
    # the cumsum's totals collect already summed len — and the global
    # positions are dense (each doc occupies [off+1, off+len]), so
    # max(gpos) ≡ Σ len: the former separate toks.agg(max, count) pass
    # re-ran the whole tokenize-explode for two scalars (r11, guide
    # §2.1/§5.3)
    gt: dict = {}
    offs = partitioned_cumsum(
        sized.select("doc", "len"), ["doc"], ["len"], inclusive=False,
        grand_totals=gt,
    )
    toks = (
        sized.join(offs.select("doc", "cum_len"), "doc")
        .select(
            F.posexplode("w").alias("pos", "word"),
            F.col("cum_len").alias("off"),
        )
        .select("word", (F.col("off") + F.col("pos") + 1).alias("gpos"))
    )
    firsts = toks.groupBy("word").agg(F.min("gpos").alias("first_pos"))
    # checkpoint c_k = ceil(k·N/n_checkpoints); vocab(c) = words with
    # first_pos <= c — a bounded conditional aggregate
    pts = firsts.withColumn(
        "n_tokens", F.lit(int(gt["len"])).cast("long")
    )
    aggs = [F.max("n_tokens").alias("n_tokens"), F.count("*").cast("long").alias("vocab")]
    for k in range(1, n_checkpoints + 1):
        ck = F.expr(f"(n_tokens * {k} + {n_checkpoints - 1}) div {n_checkpoints}")
        aggs.append(
            F.sum((F.col("first_pos") <= ck).cast("int"))
            .cast("long")
            .alias(f"v{k}")
        )
        aggs.append(F.max(ck).cast("long").alias(f"c{k}"))
    wide = pts.agg(*aggs)
    # log-log OLS over the checkpoints: explicit fixed-order sums of k
    # bounded terms (k <= n_checkpoints literals)
    lx = [F.log(F.col(f"c{k}").cast("double")) for k in range(1, n_checkpoints + 1)]
    ly = [F.log(F.col(f"v{k}").cast("double")) for k in range(1, n_checkpoints + 1)]
    kf = float(n_checkpoints)

    def ssum(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc

    sx = ssum(lx)
    sy = ssum(ly)
    sxy = ssum([a * b for a, b in zip(lx, ly)])
    sxx = ssum([a * a for a in lx])
    beta = (F.lit(kf) * sxy - sx * sy) / (F.lit(kf) * sxx - sx * sx)
    logk = (sy - beta * sx) / F.lit(kf)
    return wide.select(
        "n_tokens",
        "vocab",
        F.round(beta * 1e6).cast("long").alias("beta_e6"),
        F.round(logk * 1e6).cast("long").alias("log_k_e6"),
    )
