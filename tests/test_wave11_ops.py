"""Invariant tests for wave-11: deterministic label propagation."""

from boann_ocsf_security_data_platform_spark.operators.graph import label_propagation


def test_lpa_two_cliques_converge_to_two_communities(spark):
    """Two disjoint triangles: after one round every node adopts the
    minimum label of its clique; communities = the two cliques."""
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    labs = {r.node: r.label for r in label_propagation(e, iters=3).collect()}
    assert len(set(labs.values())) == 2
    assert labs[1] == labs[2] == labs[3]
    assert labs[10] == labs[11] == labs[12]
    assert labs[1] != labs[10]


def test_lpa_min_label_tie_break(spark):
    """A single edge {5, 9}: each node's only neighbor label wins, so
    after round 1 they SWAP labels (5->9, 9->5); the deterministic
    min-tie-break only applies on frequency ties. After two rounds they
    swap back — fixed-round determinism, reproducible."""
    e = spark.createDataFrame([(5, 9)], "src long, dst long")
    l1 = {r.node: r.label for r in label_propagation(e, iters=1).collect()}
    assert l1 == {5: 9, 9: 5}
    l2 = {r.node: r.label for r in label_propagation(e, iters=2).collect()}
    assert l2 == {5: 5, 9: 9}


def test_lpa_star_adopts_center_then_leaves(spark):
    """Star 0-{1..5}: round 1 gives every leaf the center's label (0) and
    the center the min leaf label (1); communities after odd rounds are
    {center}=1, {leaves}=0."""
    e = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    l1 = {r.node: r.label for r in label_propagation(e, iters=1).collect()}
    assert l1[0] == 1
    assert all(l1[i] == 0 for i in range(1, 6))


def test_lpa_every_node_labeled_once(spark, sf_smoke):
    from pyspark.sql import functions as F
    from boann_ocsf_security_data_platform_spark.sources import load_table

    li = (
        load_table(spark, sf_smoke, "lineitem")
        .where(F.year("l_shipdate") == 1995)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "ok")
        .where(F.col("a.pk") < F.col("b.pk"))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    out = label_propagation(edges, iters=2)
    assert out.count() == n_nodes
    assert out.select("node").distinct().count() == n_nodes
