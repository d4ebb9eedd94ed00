"""embed_covariance / pca_project contract tests.

The corpus entry certifies the exact method against DuckDB; these tests
pin the operator laws the oracle can't see: gram-vs-exact agreement (the
scale path computes the same matrix), numpy ground truth, symmetry of the
implied matrix, the -0.0 fold, and pca_project's variance ordering /
determinism / error surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from datafusion_ballista_python_spark.operators.similarity import (
    embed_covariance,
    pca_project,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_mat(emb):
    return np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )


def _as_dict(rows):
    return {(r["i"], r["j"]): r["cov"] for r in rows}


def test_exact_matches_numpy(emb, emb_mat):
    got = _as_dict(embed_covariance(emb, dim=64).collect())
    ref = np.cov(emb_mat, rowvar=False, bias=True)
    assert len(got) == 64 * 65 // 2
    worst = max(abs(got[(i, j)] - ref[i, j]) for (i, j) in got)
    # exact mode rounds products at 6 decimals; n products accumulate
    assert worst < 5e-6


def test_gram_matches_exact(emb):
    exact = _as_dict(embed_covariance(emb, dim=64, method="exact").collect())
    gram = _as_dict(embed_covariance(emb, dim=64, method="gram").collect())
    assert set(exact) == set(gram)
    worst = max(abs(exact[k] - gram[k]) for k in exact)
    assert worst <= 2e-6  # both round at 6; one ulp of rounding apart


def test_no_negative_zero(emb):
    for method in ("exact", "gram"):
        rows = embed_covariance(emb, dim=64, method=method).collect()
        assert not any(
            r["cov"] == 0.0 and np.signbit(r["cov"]) for r in rows
        ), f"-0.0 leaked through method={method}"


def test_upper_triangle_only(emb):
    rows = embed_covariance(emb, dim=64).collect()
    assert all(0 <= r["i"] <= r["j"] < 64 for r in rows)


def test_dim_inferred(emb):
    got = embed_covariance(emb).limit(1).collect()
    assert len(got) == 1


def test_unknown_method_raises(emb):
    with pytest.raises(ValueError, match="unknown method"):
        embed_covariance(emb, dim=64, method="banana")


def test_empty_input_no_dim_raises(spark):
    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="empty input"):
        embed_covariance(empty)


def test_pca_variance_ordering_and_shape(emb, emb_mat):
    out = pca_project(emb, k=3).collect()
    assert len(out) == emb_mat.shape[0]
    arr = np.array([r["pca"] for r in out])
    assert arr.shape == (emb_mat.shape[0], 3)
    v = arr.var(axis=0)
    assert v[0] >= v[1] >= v[2]
    # projections onto orthonormal eigenvectors: component variances equal
    # the top eigenvalues of the covariance matrix
    ref = np.cov(emb_mat, rowvar=False, bias=True)
    eig = np.sort(np.linalg.eigvalsh(ref))[::-1][:3]
    assert np.allclose(np.sort(v)[::-1], eig, atol=1e-4)


def test_pca_deterministic(emb):
    a = {r["vec_id"]: tuple(r["pca"]) for r in pca_project(emb, k=2).collect()}
    b = {r["vec_id"]: tuple(r["pca"]) for r in pca_project(emb, k=2).collect()}
    assert a == b


def test_pca_k_out_of_range(emb):
    with pytest.raises(ValueError, match="out of range"):
        pca_project(emb, k=65)
    with pytest.raises(ValueError, match="out of range"):
        pca_project(emb, k=0)


def test_exact_generator_matches_hof_on_ragged_input(spark):
    """r11 pinned equivalence: the posexplode pair generator must produce
    the same (i, j, sxy, n) aggregates as the original nested-HOF
    formulation for EVERY input shape — ragged vectors, NULL elements,
    NULL vectors — not just the fixed-dim corpus (where the oracle pins
    it).  Rebuilds the pre-r11 expression inline as the reference."""
    from pyspark.sql import functions as F

    dim = 4
    df = spark.createDataFrame(
        [
            ([1.0, 2.0, 3.0, 4.0],),
            ([5.0, None, 7.0, 8.0],),   # NULL element
            (None,),                     # NULL vector
            ([1.5, 2.5, 3.5, 4.5, 9.9],),  # longer than dim: truncated
        ],
        "embedding array<float>",
    )
    v = F.col("embedding")
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    pair = F.explode(
        F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.sequence(i, F.lit(dim - 1)),
                    lambda j: F.struct(
                        i.cast("int").alias("i"),
                        j.cast("int").alias("j"),
                        (F.element_at(v, i + 1) * F.element_at(v, j + 1))
                        .cast("double")
                        .alias("xy"),
                    ),
                ),
            )
        )
    ).alias("p")
    ref_sums = (
        df.select(pair)
        .select("p.i", "p.j", "p.xy")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("xy").cast("decimal(25,6)")).cast("double").alias("sxy"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    ref = sorted(
        (r["i"], r["j"], r["sxy"], r["n"]) for r in ref_sums.collect()
    )
    got = sorted(
        (r["i"], r["j"], r["cov"])
        for r in embed_covariance(df, dim=dim, method="exact").collect()
    )
    # cov = sxy/n - mean_i * mean_j, so equality of the full cov frame
    # pins equality of the (sxy, n) aggregates the generator feeds; compute
    # the reference cov off the HOF sums with the same means/assemble.
    means = (
        df.select(
            F.posexplode(F.transform(v, lambda x: x.cast("double"))).alias(
                "mi", "x"
            )
        )
        .groupBy("mi")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean")
        )
    )
    from datafusion_ballista_python_spark.operators.similarity import (
        _assemble_cov,
    )

    want = sorted(
        (r["i"], r["j"], r["cov"])
        for r in _assemble_cov(ref_sums, means, 6).collect()
    )
    assert got == want
    assert len(ref) == dim * (dim + 1) // 2  # every pair present despite NULLs


def test_exact_short_vector_raises_like_old_form(spark):
    """A vector SHORTER than dim raised INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    under ANSI in the pre-r11 nested-HOF form (element_at past the end);
    the posexplode generator pads with the same element_at, so the error
    surface is unchanged."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401
    import pyspark

    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<float>")
    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX|out of bounds"):
        embed_covariance(df, dim=4, method="exact").collect()
