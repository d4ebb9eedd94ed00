"""SemDeDup-style semantic deduplication over embedding columns.

Public algorithm (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): cluster embeddings with k-means,
then inside each cluster drop every vector whose cosine similarity to
another cluster member exceeds a threshold, keeping one representative per
near-duplicate neighborhood.  The reference engine
(/root/reference, apache/datafusion-ballista-python) has no such operator —
this is part of the LLM-data-pipeline extension surface (SURVEY.md §2.13).

100 TB design
-------------
- Cluster assignment is a pure map: the k x dim centroid matrix rides to
  every executor inside ONE Arrow-batched numpy matmul per batch — no
  shuffle, no per-row Python.  Assignment is nearest-EUCLIDEAN centroid
  (argmax of dot(x,c) - ||c||^2/2), which equals max-dot ordering exactly
  when centroids are unit-norm (the pinned-hyperplane oracle path) and
  stays correct for trained mean centroids of unequal norm.
- The pairwise stage is blocked by cluster id: an equi-join on ``cell``
  bounds the candidate set to cluster size, never all-pairs.  At 100 TB the
  embedding table is written partitioned by cell so the self-join is
  file-pruned per cell (same layout as similarity.write_ivf_index).
- The keep/drop rule is "drop iff a LOWER-ID cluster-mate is within the
  threshold" — deterministic, one join, no iterative clustering of the
  duplicate graph.  Note this is SemDeDup's one-pass rule, not connected
  components: two members of the same transitive duplicate chain can both
  survive when they are not themselves within the threshold (use
  operators/graph.connected_components on the pair list when one-per-chain
  semantics are required).
- Training the centroids (kmeans_fit) is Lloyd over the FULL corpus with
  bounded driver traffic: each round is one map-side assignment plus one
  (cell, dim) partial-sum shuffle whose group count is at most k x dim;
  only those finals (fewer when a cell is empty) ever reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .dedup import embedding_near_dup_pairs
from .similarity import _matrix


def _nearest_centroid_udf(centroids: list[list[float]], emit: str = "cell"):
    """Arrow-batched nearest-Euclidean-centroid: argmin ||x-c||^2 computed
    as argmax(x.c - ||c||^2/2) — one (B x dim) @ (dim x k) matmul plus a
    broadcast bias row per batch.  Ties break toward the lowest cell id
    (stable argmax).  ``emit='cell'`` returns the cell id; ``emit='sqdist'``
    returns the squared distance to that nearest centroid (for the SSE
    objective) without a second pass.

    For unit-norm centroids the bias is constant, so the cell ordering is
    identical to raw max-dot — which is why the pinned-hyperplane DuckDB
    oracles (ORDER BY dot DESC, cell) stay exact under this assignment.
    """
    cent = np.array(centroids, dtype=np.float64)
    bias = 0.5 * (cent * cent).sum(axis=1)  # ||c||^2 / 2, shape (k,)

    if emit == "cell":

        @pandas_udf("int")
        def _assign(v: pd.Series) -> pd.Series:
            mat = _matrix(v)
            if mat.shape[0] == 0:
                return pd.Series([], dtype="int32")
            score = mat @ cent.T - bias
            return pd.Series(np.argmax(score, axis=1).astype("int32"))

        return _assign

    @pandas_udf("double")
    def _sqdist(v: pd.Series) -> pd.Series:
        mat = _matrix(v)
        if mat.shape[0] == 0:
            return pd.Series([], dtype="float64")
        score = mat @ cent.T - bias
        cells = np.argmax(score, axis=1)
        # ||x-c||^2 = ||x||^2 - 2 (x.c - ||c||^2/2) = ||x||^2 - 2*score
        xsq = (mat * mat).sum(axis=1)
        return pd.Series(xsq - 2.0 * score[np.arange(mat.shape[0]), cells])

    return _sqdist


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Nearest-Euclidean-centroid cluster id as a new column (map-only;
    see :func:`_nearest_centroid_udf` for why this matches the max-dot
    DuckDB oracle ordering when centroids are unit-norm)."""
    return df.withColumn(
        cell_col, _nearest_centroid_udf(centroids, "cell")(F.col(vec_col))
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 4,
) -> DataFrame:
    """Per-vector keep/drop decisions: ``(id_col, cell, keep)``.

    A vector is dropped iff some LOWER-id member of its cluster has cosine
    similarity >= ``threshold`` (round to ``round_digits`` first so the
    decision is bit-stable across engines).  The lowest id in each
    near-duplicate neighborhood always survives; one-pass SemDeDup rule,
    not transitive-chain clustering (see module docstring).

    The clustered frame feeds three consumers (both self-join sides and
    the final keep projection), so it is persisted — otherwise the
    assignment matmul and the source scan would run 3x per action.
    """
    clustered = assign_clusters(df, centroids, vec_col).persist()
    pairs = embedding_near_dup_pairs(
        clustered,
        threshold=threshold,
        vec_col=vec_col,
        id_col=id_col,
        block_cols=["cell"],
        round_digits=round_digits,
    )
    # doc_a < doc_b in every pair -> doc_b has a lower-id near-duplicate
    dropped = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return (
        clustered.select(F.col(id_col), F.col("cell"))
        .join(dropped.withColumn("__drop", F.lit(True)), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Distributed Lloyd k-means over the FULL table (not a sample).

    Per round: (1) map-side nearest-Euclidean-centroid assignment
    (broadcast k x dim matrix, Arrow matmul with the ||c||^2/2 bias — raw
    max-dot would not be Lloyd for non-unit centroids and would break SSE
    monotonicity); (2) per-dimension partial sums via posexplode +
    groupBy(cell, dim) — map-side combine means the shuffle carries at
    most ``n_partitions x k x dim`` partial rows, and the driver collects
    at most ``k x dim`` finals per round (fewer when a cell is empty).
    Nothing else ever reaches the driver, so the same code runs unchanged
    on a 1000-executor cluster; cost per round is one scan + one bounded
    shuffle.

    Empty cells keep their previous centroid (standard Lloyd).  Returns
    plain python lists so results broadcast cheaply and embed in oracles.
    """
    first = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )  # deterministic init: first k vectors by id (k rows, bounded)
    cent = np.array([r[0] for r in first], dtype=np.float64)
    k = cent.shape[0]
    for _ in range(iters):
        assigned = df.withColumn(
            "__cell", _nearest_centroid_udf(cent.tolist(), "cell")(F.col(vec_col))
        )
        sums = (
            assigned.select(
                F.col("__cell"), F.posexplode(F.col(vec_col)).alias("__dim", "__v")
            )
            .groupBy("__cell", "__dim")
            .agg(
                F.sum(F.col("__v").cast("double")).alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )  # at most k x dim rows
        new = cent.copy()
        for row in sums:
            new[row["__cell"], row["__dim"]] = row["__s"] / row["__n"]
        cent = new
    return [[float(x) for x in row] for row in cent]


def kmeans_sse(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Sum of squared Euclidean distances to each vector's nearest
    centroid (one scan, one scalar to the driver) — the Lloyd objective,
    used by tests to assert monotone non-increase across kmeans_fit
    rounds.  Distance comes out of the same Arrow matmul that picks the
    cell — a literal k x dim expression tree would put thousands of
    constant nodes in the Catalyst plan (see similarity.lsh_bucket's
    docstring for the measured analysis-time blowup)."""
    sq = _nearest_centroid_udf(centroids, "sqdist")(F.col(vec_col))
    row = df.select(F.sum(sq).alias("sse")).collect()[0]
    return float(row["sse"])
