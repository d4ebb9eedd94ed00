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
  every executor inside ONE Arrow-batched numpy matmul per batch
  (similarity._cell_assign_udf) — no shuffle, no per-row Python.
- The pairwise stage is blocked by cluster id: an equi-join on ``cell``
  bounds the candidate set to cluster size, never all-pairs.  At 100 TB the
  embedding table is written partitioned by cell so the self-join is
  file-pruned per cell (same layout as similarity.write_ivf_index).
- The keep/drop rule is "drop iff a LOWER-ID cluster-mate is within the
  threshold" — deterministic, one semi-join, no iterative clustering of the
  duplicate graph (SemDeDup keeps one arbitrary member per neighborhood; we
  pin 'lowest id' so results are reproducible and oracle-checkable).
- Training the centroids (kmeans_fit) is Lloyd over the FULL corpus with
  bounded driver traffic: each round is one map-side assignment plus one
  (cell, dim) partial-sum shuffle of at most k x dim rows; only the k x dim
  centroid matrix is ever collected.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import embedding_near_dup_pairs
from .similarity import _cell_assign_udf


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid (max dot product) cluster id as a new column.

    Map-only: one Arrow-batched (B x dim) @ (dim x k) matmul per batch,
    ties broken toward the lowest cell id (matches the DuckDB oracle's
    ROW_NUMBER ... ORDER BY dot DESC, cell)."""
    return df.withColumn(cell_col, _cell_assign_udf(centroids)(F.col(vec_col)))


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
    decision is bit-stable across engines).  Exactly one representative
    (the lowest id) survives per duplicate neighborhood chain.
    """
    clustered = assign_clusters(df, centroids, vec_col)
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

    Per round: (1) map-side nearest-centroid assignment (broadcast k x dim
    matrix, Arrow matmul); (2) per-dimension partial sums via
    posexplode + groupBy(cell, dim) — map-side combine means the shuffle
    carries at most ``n_partitions x k x dim`` partial rows, and the driver
    collects exactly ``k x dim`` finals per round.  Nothing else ever
    reaches the driver, so the same code runs unchanged on a 1000-executor
    cluster; cost per round is one scan + one bounded shuffle.

    Empty cells keep their previous centroid (standard Lloyd).  Returns
    plain python lists so results broadcast cheaply and embed in oracles.
    """
    first = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )  # deterministic init: first k vectors by id (k rows, bounded)
    cent = np.array([r[0] for r in first], dtype=np.float64)
    k = cent.shape[0]
    for _ in range(iters):
        assigned = df.withColumn("__cell", _cell_assign_udf(cent.tolist())(F.col(vec_col)))
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
        )  # exactly k x dim rows
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
    """Sum of squared distances to each vector's nearest centroid (one
    scan, one scalar to the driver) — the Lloyd objective, used by tests
    to assert monotone non-increase across kmeans_fit rounds."""
    cent = np.array(centroids, dtype=np.float64)
    assigned = assign_clusters(df, cent.tolist(), vec_col, "__cell")
    # ||x - c||^2 = ||x||^2 - 2<x,c> + ||c||^2 ; do it JVM-side per row
    from .similarity import dot

    cent_sq = {i: float(np.dot(c, c)) for i, c in enumerate(cent)}
    cent_arr = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in cent
        ]
    )
    cvec = F.element_at(cent_arr, F.col("__cell") + 1)
    sq = (
        dot(F.col(vec_col), F.col(vec_col))
        - 2.0 * dot(F.col(vec_col), cvec)
        + F.element_at(
            F.array(*[F.lit(cent_sq[i]) for i in range(len(cent))]),
            F.col("__cell") + 1,
        )
    )
    row = assigned.select(F.sum(sq).alias("sse")).collect()[0]
    return float(row["sse"])
