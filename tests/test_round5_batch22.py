"""Batch-22: knn_classify, friedman_test, corr_matrix."""


def test_knn_classify_separable_clusters(spark):
    import random

    from smartpy_arc_spark.operators.similarity import knn_classify

    random.seed(7)
    rows = [
        (
            i,
            [float(i % 3) * 10 + random.random() for _ in range(4)],
            i % 3,
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = knn_classify(df, "vec_id", "embedding", "label", k=3).collect()
    assert len(out) == 15  # odd ids are the test split
    assert all(r.correct == 1 for r in out)  # well-separated clusters


def test_knn_classify_vote_tiebreak_smallest_label(spark):
    from smartpy_arc_spark.operators.similarity import knn_classify

    # test id 1 at origin; two neighbors of label 9 and two of label 2
    # equidistant -> k=4 splits 2/2 -> smallest label (2) wins
    rows = [
        (1, [0.0, 0.0], 5),
        (2, [1.0, 0.0], 9),
        (4, [0.0, 1.0], 9),
        (6, [-1.0, 0.0], 2),
        (8, [0.0, -1.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    r = knn_classify(df, "vec_id", "embedding", "label", k=4).collect()[0]
    assert r.pred_label == 2 and r.correct == 0


def test_friedman_perfect_agreement(spark):
    from smartpy_arc_spark.operators.stats import friedman_test

    rows = [
        (b, t, float(b + {"x": 1, "y": 2, "z": 3}[t]))
        for b in range(4)
        for t in "xyz"
    ]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    # ranks (1,2,3) in every block: Q = 12*224/48 - 48 = 8
    assert r.n_blocks == 4 and r.k_treatments == 3
    assert r.q_e6 == 8_000_000


def test_friedman_incomplete_blocks_dropped(spark):
    from smartpy_arc_spark.operators.stats import friedman_test

    rows = [
        (b, t, float(b + {"x": 1, "y": 2, "z": 3}[t]))
        for b in range(4)
        for t in "xyz"
    ] + [(9, "x", 1.0)]  # block 9 misses y, z
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r.n_blocks == 4  # incomplete block excluded


def test_friedman_tied_block_average_ranks(spark):
    from smartpy_arc_spark.operators.stats import friedman_test

    # all three treatments equal in every block -> Q = 0
    rows = [(b, t, 5.0) for b in range(3) for t in "xyz"]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    assert friedman_test(df, "b", "t", "v").collect()[0].q_e6 == 0


def test_corr_matrix_exact_signs(spark):
    from smartpy_arc_spark.operators.stats import corr_matrix

    rows = [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {(r.col_a, r.col_b): r for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")].corr_e6 == 1_000_000
    assert out[("a", "c")].corr_e6 == -1_000_000
    assert out[("b", "c")].corr_e6 == -1_000_000
    assert len(out) == 3 and all(r.n == 3 for r in out.values())


def test_corr_matrix_constant_column_null(spark):
    from smartpy_arc_spark.operators.stats import corr_matrix

    rows = [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    r = corr_matrix(df, ["a", "b"]).collect()[0]
    assert r.corr_e6 is None  # zero variance -> undefined
