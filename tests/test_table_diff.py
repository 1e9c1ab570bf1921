"""table_diff semantics: classification, null-safe comparison, composite
keys."""

from boann_ocsf_security_data_platform_spark.operators.relational import table_diff


def test_diff_classifies_all_four_states(spark):
    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 99.0), (4, "w", 40.0)],
        "k long, s string, v double",
    )
    got = {r.k: r.diff_status for r in table_diff(a, b, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_diff_null_safe_value_compare(spark):
    """NULL == NULL must read as unchanged; NULL vs value as changed —
    plain equality would misclassify both."""
    a = spark.createDataFrame([(1, None), (2, None), (3, "v")], "k long, s string")
    b = spark.createDataFrame([(1, None), (2, "now"), (3, None)], "k long, s string")
    got = {r.k: r.diff_status for r in table_diff(a, b, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "changed"}


def test_diff_composite_key(spark):
    a = spark.createDataFrame(
        [("p", 1, 5), ("p", 2, 6), ("q", 1, 7)], "g string, k long, v long"
    )
    b = spark.createDataFrame(
        [("p", 1, 5), ("q", 1, 8), ("q", 2, 9)], "g string, k long, v long"
    )
    got = {(r.g, r.k): r.diff_status for r in table_diff(a, b, ["g", "k"]).collect()}
    assert got == {
        ("p", 1): "unchanged",
        ("p", 2): "removed",
        ("q", 1): "changed",
        ("q", 2): "added",
    }


def test_diff_compare_cols_subset(spark):
    """With compare_cols restricted, drift in other columns is invisible."""
    a = spark.createDataFrame([(1, "same", "old")], "k long, a string, b string")
    b = spark.createDataFrame([(1, "same", "new")], "k long, a string, b string")
    got = table_diff(a, b, ["k"], compare_cols=["a"]).collect()
    assert got[0].diff_status == "unchanged"
