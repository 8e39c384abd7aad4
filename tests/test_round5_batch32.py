"""Batch-32: bigram_suggest, class_balance, woe_iv."""


def test_bigram_suggest_conditionals(spark):
    from smartpy_arc_spark.operators.text import bigram_suggest

    docs = [
        ("the cat sat",),
        ("the cat ran",),
        ("the dog sat",),
        ("the cat sat",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = {
        (r.head, r.next_word): r
        for r in bigram_suggest(df, "text", top_k=3, min_count=1).collect()
    }
    r = out[("the", "cat")]
    assert r.n_pair == 3 and r.n_head == 4 and r.rank == 1
    assert r.p_e6 == 750000
    assert out[("cat", "sat")].p_e6 == round(2 / 3 * 1e6)


def test_bigram_suggest_rank_tiebreak(spark):
    from smartpy_arc_spark.operators.text import bigram_suggest

    docs = [("x a",), ("x b",), ("x a",), ("x b",)]
    df = spark.createDataFrame(docs, "text string")
    out = bigram_suggest(df, "text", top_k=2, min_count=1).collect()
    ranks = {r.next_word: r.rank for r in out if r.head == "x"}
    assert ranks == {"a": 1, "b": 2}  # tie -> word asc


def test_class_balance_equal_sizes(spark):
    from smartpy_arc_spark.operators.sample import class_balance

    rows = [(i, "big") for i in range(100)] + [
        (1000 + i, "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, lbl string")
    out = class_balance(df, "lbl", "id").collect()
    by = {}
    for r in out:
        by.setdefault(r.lbl, []).append(r.id)
    assert len(by["big"]) == 10 and len(by["small"]) == 10
    # deterministic: rerun yields the identical set
    out2 = class_balance(df, "lbl", "id").collect()
    assert sorted((r.lbl, r.id) for r in out) == sorted(
        (r.lbl, r.id) for r in out2
    )


def test_woe_iv_separating_score(spark):
    from smartpy_arc_spark.operators.stats import woe_iv

    # score perfectly separates: top half all good, bottom all bad
    rows = [(i, float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = {r.bin: r for r in woe_iv(df, "s", "y", "id", n_bins=4).collect()}
    assert len(out) == 4 and all(r.n == 25 for r in out.values())
    # pure bins have undefined WOE (0 goods or 0 bads) -> null
    assert out[0].woe_e9 is None and out[3].woe_e9 is None
    assert out[0].n_bad == 25 and out[3].n_good == 25


def test_woe_iv_mixed_bins_signs(spark):
    from smartpy_arc_spark.operators.stats import woe_iv

    # interleave so every bin is mixed; high bins richer in goods
    rows = [
        (i, float(i), 1 if (i % 10) < (i // 25 + 3) else 0)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = sorted(
        woe_iv(df, "s", "y", "id", n_bins=4).collect(), key=lambda r: r.bin
    )
    assert all(r.woe_e9 is not None for r in out)
    assert out[-1].woe_e9 > out[0].woe_e9  # goods concentrate high
    assert all(r.iv_term_e9 >= 0 for r in out)  # IV terms nonnegative
