"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: candidates never leave
  their partitions; per-partition top-k (window) then a tiny final merge.
  The exact baseline every ANN variant is measured against.
- :func:`lsh_topk` — random-hyperplane LSH: probe only candidates sharing
  a hash bucket with the query.  Sub-linear candidate sets at the cost of
  recall; the 100 TB path.

Vector math uses Catalyst higher-order functions (``aggregate``/
``zip_with``) — JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "qid",
    query_vec: str = "qe",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k per query vector (brute force).

    The query side is tiny -> Catalyst broadcasts it; each candidate
    partition scores + window-ranks locally, so only ~k rows per query per
    partition reach the final exchange.
    """
    sim = cosine_sim(F.col(query_vec), F.col(vec_col))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    extra = [c for c in candidates.columns if c not in (vec_col,)]
    scored = F.broadcast(queries).crossJoin(candidates).select(
        F.col(query_id), *[F.col(c) for c in extra], sim.alias("cos_sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, seeded)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (JVM-side expressions)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in p]), lambda a, b: (a * b).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "qid",
    query_vec: str = "qe",
) -> DataFrame:
    """Approximate top-k with multi-table random-hyperplane LSH.

    OR-amplification: ``n_tables`` independent plane sets; a candidate is
    probed if it shares a bucket with the query in ANY table (recall
    ~ 1-(1-p^n_planes)^n_tables).  Each table contributes one equi-join on
    its bucket id — shuffles on bucket keys only, candidate sets shrink
    ~2^n_planes-fold per table vs the brute-force cross join.
    """
    # candidate-pair generation: one hash equi-join per table (NOT an OR-join,
    # which would degrade to a nested loop), unioned + deduped before the
    # expensive cosine scoring
    pair_frames = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        cb = candidates.select(
            F.col(id_col), lsh_bucket(F.col(vec_col), planes).alias("__bucket")
        )
        qb = queries.select(
            F.col(query_id), lsh_bucket(F.col(query_vec), planes).alias("__bucket")
        )
        pair_frames.append(
            F.broadcast(qb).join(cb, on="__bucket", how="inner").select(query_id, id_col)
        )
    pairs = pair_frames[0]
    for pf in pair_frames[1:]:
        pairs = pairs.union(pf)
    pairs = pairs.distinct()

    sim = F.round(cosine_sim(F.col(query_vec), F.col(vec_col)), 4)
    extra = [c for c in candidates.columns if c != vec_col]
    scored = (
        pairs.join(F.broadcast(queries), on=query_id)
        .join(candidates, on=id_col)
        .select(F.col(query_id), *[F.col(c) for c in extra], sim.alias("cos_sim"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# -- IVF (inverted-file) ANN ------------------------------------------------

def _nearest_centroid_structs(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of (neg_dot, cid) structs, one per centroid — struct ordering
    makes array_min/array_sort pick by similarity.  All JVM expressions."""
    entries = []
    for cid, c in enumerate(centroids):
        d = dot(vec, F.array(*[F.lit(x) for x in c]))
        entries.append(F.struct((-d).alias("nd"), F.lit(cid).alias("cid")))
    return F.array(*entries)


def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 4096,
) -> list[list[float]]:
    """k-means-lite coarse quantizer: deterministic init (first k vectors by
    id), then ``iters`` assign/average rounds over a bounded sample.

    Quantizer quality needs a representative sample, not the full corpus —
    training cost stays O(sample x iters) no matter how big the table is
    (the full corpus is only touched once, by the final cell assignment in
    ivf_topk).  Each round is one broadcast map + one partial-aggregated
    groupBy; only k x dim floats ever reach the driver."""
    sample = df.orderBy(id_col).limit(sample_rows) if sample_rows else df
    centroids = [
        list(r[vec_col])
        for r in sample.limit(n_centroids).select(vec_col).collect()
    ]
    for _ in range(iters):
        assigned = sample.select(
            F.array_min(_nearest_centroid_structs(F.col(vec_col), centroids))["cid"].alias("cid"),
            F.col(vec_col),
        )
        dim = len(centroids[0])
        means = (
            assigned.groupBy("cid")
            .agg(*[
                F.avg(F.col(vec_col)[i]).alias(f"m{i}") for i in range(dim)
            ])
            .collect()
        )
        new = {r["cid"]: [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return centroids


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "qid",
    query_vec: str = "qe",
) -> DataFrame:
    """IVF ANN: coarse-quantize candidates into ``n_centroids`` cells, then
    score each query only against its ``n_probe`` nearest cells.

    Scale path: cell assignment is a pure broadcast map (the k x dim
    centroid table rides along to every executor); the probe is an equi-join
    on cell id — candidates are pruned ~n_centroids/n_probe-fold before any
    cosine math, and at 100 TB the candidate table would be written out
    partitioned by cell id so probes touch only matching files."""
    centroids = train_centroids(candidates, n_centroids, iters, vec_col, id_col)

    cells = candidates.withColumn(
        "__cell",
        F.array_min(_nearest_centroid_structs(F.col(vec_col), centroids))["cid"],
    )
    probes = queries.withColumn(
        "__cell",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_nearest_centroid_structs(F.col(query_vec), centroids)),
                    1,
                    n_probe,
                ),
                lambda s: s["cid"],
            )
        ),
    )
    sim = F.round(cosine_sim(F.col(query_vec), F.col(vec_col)), 4)
    extra = [c for c in candidates.columns if c != vec_col]
    scored = F.broadcast(probes).join(cells, on="__cell").select(
        F.col(query_id), *[F.col(c) for c in extra], sim.alias("cos_sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
