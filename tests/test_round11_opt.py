"""Round-11 optimization equivalence pins: restructured operators must
produce bit-identical output to their pre-optimization composition."""

import pyspark.sql.functions as F


def _docs(spark):
    rows = []
    for i in range(40):
        # three exact-dup families + singletons, word-shingle-able text
        fam = i % 7
        if fam < 2:
            text = f"the quick brown fox jumps over lazy dog {fam}"
        elif fam < 4:
            text = (
                f"alpha beta gamma delta epsilon zeta eta theta {i} "
                f"common boilerplate tail shared by most documents here"
            )
        else:
            text = f"unique document body number {i} with its own words"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_prepare_band_split_matches_one_shot(spark):
    """minhash_prepare + minhash_band_candidates (the shared-prefix path
    used by q_minhash_prod_path) must equal minhash_lsh_candidates for
    both the plain and the capped variant, with and without
    materialization."""
    from smartpy_arc_spark.operators.dedup import (
        minhash_band_candidates,
        minhash_lsh_candidates,
        minhash_prepare,
    )

    docs = _docs(spark)
    kw = dict(shingle_mode="word", shingle_size=3, collapse_exact=True)
    want_plain = sorted(
        map(tuple, minhash_lsh_candidates(docs, **kw).collect())
    )
    want_capped = sorted(
        map(
            tuple,
            minhash_lsh_candidates(docs, max_bucket_size=2, **kw).collect(),
        )
    )
    for mat in (False, True):
        sigs, star = minhash_prepare(docs, materialize=mat, **kw)
        got_plain = sorted(
            map(tuple, minhash_band_candidates(sigs, star).collect())
        )
        got_capped = sorted(
            map(
                tuple,
                minhash_band_candidates(
                    sigs, star, max_bucket_size=2
                ).collect(),
            )
        )
        assert got_plain == want_plain, f"plain mismatch (materialize={mat})"
        assert got_capped == want_capped, f"capped mismatch (materialize={mat})"
    assert len(want_capped) <= len(want_plain)


def test_logistic_fit_materialize_false_matches_default(spark):
    """materialize=False over a pre-checkpointed input (the q_logistic
    shape) must be bit-identical to the default path."""
    from smartpy_arc_spark.operators.stats import logistic_fit

    rows = [
        (i % 2 if i % 5 else 1 - i % 2, float(i % 17) - 8.0, float(i % 23))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "y int, x1 double, x2 double")
    want = sorted(map(tuple, logistic_fit(df, "y", ["x1", "x2"]).collect()))
    got = sorted(
        map(
            tuple,
            logistic_fit(
                df.localCheckpoint(eager=True),
                "y",
                ["x1", "x2"],
                materialize=False,
            ).collect(),
        )
    )
    assert got == want


def test_cosine_threshold_pairs_bounded_matches_hof(spark):
    """The vectorized mapInPandas kernel (q_embedding_near_dup) must be
    bit-identical to the staged-norm HOF broadcast-join form, including
    edge cases: mismatched lengths, zero vectors, negative cosines,
    null vectors, null elements."""
    import math
    import random

    from smartpy_arc_spark.operators.similarity import (
        _dot,
        cosine_threshold_pairs_bounded,
    )

    rng = random.Random(7)
    rows = []
    for i in range(60):
        if i == 11:
            vec = None  # null vector
        elif i == 13:
            vec = [0.0, 0.0, 0.0, 0.0]  # zero norm
        elif i == 17:
            vec = [1.0, None, 0.5, -0.25]  # null element poisons fold
        elif i % 10 == 9:
            vec = [rng.uniform(-1, 1) for _ in range(6)]  # odd length
        else:
            base = [rng.uniform(-1, 1) for _ in range(4)]
            if i % 3 == 0:
                base = [-x for x in base]  # negative-cos partners
            vec = base
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    va = F.col("embedding").cast("array<double>")
    q = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("id_a"), va.alias("_va"),
        _dot(va, va).alias("_na2"),
    )
    c = emb.select(
        F.col("vec_id").alias("id_b"), va.alias("_vb"),
        _dot(va, va).alias("_nb2"),
    )
    pairs = c.join(F.broadcast(q), F.col("id_b") > F.col("id_a"))
    denom = F.sqrt(F.col("_na2") * F.col("_nb2"))
    cos = F.when(denom > 0, _dot(F.col("_va"), F.col("_vb")) / denom)
    thr = -0.2  # negative threshold so negative cosines are exercised
    want = sorted(
        map(
            tuple,
            pairs.select("id_a", "id_b", cos.alias("cos"))
            .where(F.col("cos") > thr)
            .collect(),
        )
    )

    q_rows = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("id_a"), va.alias("_va")
    ).collect()
    got = sorted(
        map(
            tuple,
            cosine_threshold_pairs_bounded(
                emb.select(F.col("vec_id").alias("id_a"), va.alias("_va")),
                q_rows,
                vec_col="_va",
                id_col="id_a",
                threshold=thr,
            ).collect(),
        )
    )
    assert len(want) > 0
    assert len(got) == len(want)
    for (wa, wb, wc), (ga, gb, gc) in zip(want, got):
        assert (wa, wb) == (ga, gb)
        # bit-identity, not approximate equality
        assert math.isclose(wc, gc, rel_tol=0.0, abs_tol=0.0), (wa, wb, wc, gc)


def test_partitioned_cumsum_grand_totals(spark):
    """grand_totals returns the driver-side total of each sum column —
    the count-job elimination used by theil_sen/conformal."""
    from smartpy_arc_spark.operators.scale import partitioned_cumsum

    df = spark.createDataFrame(
        [(i, 1, i % 3) for i in range(50)], "k int, one int, w int"
    )
    gt: dict = {}
    out = partitioned_cumsum(df, ["k"], ["one", "w"], grand_totals=gt)
    assert gt["one"] == 50
    assert gt["w"] == sum(i % 3 for i in range(50))
    # and the cumsum output itself is unchanged by the out-param
    top = out.orderBy(F.desc("k")).limit(1).collect()[0]
    assert top["cum_one"] == 50


def test_wilcoxon_all_zero_diffs(spark):
    """All-zero diffs: the folded single-pass form must report
    n_pairs = #rows with an EMPTY nonzero rank table (the cumsum's
    grand total is 0 and the zero group carries the whole count)."""
    from smartpy_arc_spark.operators.stats import wilcoxon_signed_rank

    rows = [(10.0, 10.0), (20.0, 20.0), (30.0, 30.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert r.n_pairs == 3
    # no nonzero diffs: rank aggregate is the empty-aggregate row
    assert r.n_nonzero is None or r.n_nonzero == 0


def test_distributed_ntile_literal_n_matches_window(spark):
    """The literal-n NTILE arithmetic (grand_totals path) must equal
    SQL NTILE over a single global ordering, including the uneven
    remainder split."""
    from pyspark.sql import Window as W

    from smartpy_arc_spark.operators.scale import distributed_ntile

    df = spark.createDataFrame([(i,) for i in range(23)], "v int")
    got = {
        r["v"]: r["bucket"]
        for r in distributed_ntile(df, ["v"], 4).collect()
    }
    want = {
        r["v"]: r["b"]
        for r in df.select(
            "v", F.ntile(4).over(W.orderBy("v")).alias("b")
        ).collect()
    }
    assert got == want
