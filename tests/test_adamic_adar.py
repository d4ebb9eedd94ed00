"""graph.adamic_adar contract tests: hand-computed scores, adjacency
exclusion, hub cap, normalization (the corpus entry graph_adamic_adar
certifies cross-engine parity)."""

from __future__ import annotations

import math

from datafusion_ballista_python_spark.operators.graph import adamic_adar


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = adamic_adar(df, **kw).orderBy("node_a", "node_b").collect()
    return {(r.node_a, r.node_b): (r.n_common, r.aa_score) for r in out}


def test_path_graph_predicts_endpoints(spark):
    # 1-2-3: only (1,3) is predicted, via z=2 with deg 2
    got = _run(spark, [(1, 2), (2, 3)])
    assert set(got) == {(1, 3)}
    n, s = got[(1, 3)]
    assert n == 1 and s == round(1 / math.log(2), 9)


def test_existing_edges_excluded_and_weights_sum(spark):
    # square 1-2-3-4-1: (1,3) via z in {2,4}, (2,4) via z in {1,3};
    # all degrees 2
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    w = round(1 / math.log(2), 9)
    assert got == {(1, 3): (2, 2 * w), (2, 4): (2, 2 * w)}


def test_hub_weight_smaller_than_rare_neighbor(spark):
    # (1,2) share hub 9 (deg 4) and rare 5 (deg 2)
    edges = [(1, 9), (2, 9), (3, 9), (4, 9), (1, 5), (2, 5)]
    got = _run(spark, edges)
    n, s = got[(1, 2)]
    assert n == 2
    assert s == round(1 / math.log(4), 9) + round(1 / math.log(2), 9)


def test_max_hub_degree_skips_hub_apex(spark):
    edges = [(1, 9), (2, 9), (3, 9), (4, 9), (1, 5), (2, 5)]
    got = _run(spark, edges, max_hub_degree=2)
    # hub 9 (deg 4) no longer an apex: (1,2) scored via 5 only
    assert got[(1, 2)] == (1, round(1 / math.log(2), 9))
    assert (3, 4) not in got


def test_direction_and_self_loops_normalized(spark):
    got = _run(spark, [(2, 1), (2, 3), (2, 2), (1, 2)])
    assert set(got) == {(1, 3)}


def test_clique_predicts_nothing(spark):
    got = _run(spark, [(1, 2), (1, 3), (2, 3)])
    assert got == {}
