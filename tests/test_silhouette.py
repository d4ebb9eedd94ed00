"""silhouette_simplified contract tests: separated clusters score high,
overlapping centroids score 0, assignment tie-break, error surface."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.operators.similarity import (
    silhouette_simplified,
)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_well_separated_clusters_score_high(spark):
    vecs = [[0.1, 0.0], [0.0, 0.1], [-0.1, 0.0], [10.1, 10.0], [9.9, 10.0], [10.0, 10.2]]
    out = {
        r["cell"]: r.asDict()
        for r in silhouette_simplified(
            _df(spark, vecs), [[0.0, 0.0], [10.0, 10.0]]
        ).collect()
    }
    assert out[0]["n"] == 3 and out[1]["n"] == 3
    assert out[0]["mean_s"] > 0.95 and out[1]["mean_s"] > 0.95


def test_point_on_tied_centroids_scores_zero(spark):
    # equidistant from both centroids: a = b -> s = 0, assigned to cell 0
    out = silhouette_simplified(
        _df(spark, [[5.0, 5.0]]), [[0.0, 0.0], [10.0, 10.0]]
    ).collect()
    assert len(out) == 1
    assert out[0]["cell"] == 0 and out[0]["mean_s"] == 0.0


def test_point_on_duplicate_centroids_zero_not_nan(spark):
    out = silhouette_simplified(
        _df(spark, [[1.0, 1.0]]), [[1.0, 1.0], [1.0, 1.0]]
    ).collect()
    assert out[0]["mean_s"] == 0.0


def test_midway_point_scores_low(spark):
    out = silhouette_simplified(
        _df(spark, [[4.0, 0.0]]), [[0.0, 0.0], [10.0, 0.0]]
    ).collect()
    # a = 4, b = 6 -> s = 2/6
    assert out[0]["cell"] == 0
    assert out[0]["mean_s"] == round(2 / 6, 6)


def test_single_centroid_raises(spark):
    with pytest.raises(ValueError, match=">= 2 centroids"):
        silhouette_simplified(_df(spark, [[0.0, 0.0]]), [[0.0, 0.0]])


def test_deterministic(spark):
    vecs = [[float(i % 7), float(i % 3)] for i in range(50)]
    cents = [[0.0, 0.0], [6.0, 2.0], [3.0, 1.0]]
    a = sorted(map(tuple, silhouette_simplified(_df(spark, vecs), cents).collect()))
    b = sorted(map(tuple, silhouette_simplified(_df(spark, vecs), cents).collect()))
    assert a == b
