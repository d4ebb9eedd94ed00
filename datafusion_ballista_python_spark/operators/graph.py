"""Graph operators for dedup pipelines: connected components over a
near-dup pair list.

The dedup layer produces PAIRS (minhash_lsh_pairs, simhash buckets,
embedding_near_dup_pairs); turning pairs into removable duplicate sets
needs the transitive closure — docs A~B and B~C are one cluster even when
A~C was never emitted.  ``connected_components`` computes that closure as
min-label propagation, returning (node, component) where component is the
smallest node id in the cluster (a natural canonical-representative
choice: keep ``node == component``, drop the rest).

Scale design:
- one shuffle per iteration (a join on node id + a min-aggregate), with
  iteration count bounded by the cluster DIAMETER — near-dup graphs are
  dense blobs with tiny diameters, so 3-5 iterations is typical even at
  corpus scale;
- labels only ever decrease, so convergence is detected from the
  monotone sum of labels (one scalar agg per iteration, no change-join);
- each iteration is ``localCheckpoint``-ed: iterative DataFrame loops
  otherwise double the lineage every pass, and the checkpoint also
  caches the frame the convergence check just computed (on a real
  cluster prefer ``spark.sparkContext.setCheckpointDir`` + reliable
  ``checkpoint`` for executor-loss resilience);
- for adversarially long chains or whale components, the
  large-star/small-star variant (Kiveris et al., "Connected Components
  in MapReduce and Beyond") halves path lengths per round (O(log d)
  rounds); min-label propagation is the right default for near-dup
  workloads and keeps the per-round plan to one join + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 25,
    node_col: str = "node",
    comp_col: str = "component",
) -> DataFrame:
    """Connected components of the undirected graph given by pair rows.

    Returns one row per distinct node with its component id (the minimum
    node id reachable from it).  Raises if ``max_iterations`` rounds do
    not reach the fixpoint — that means a component has a diameter
    larger than the budget, not silent wrong answers.
    """
    # both directions from ONE scan of pairs (a union of two selects would
    # evaluate the upstream pair pipeline — often an expensive dedup plan —
    # twice)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
        .persist()
    )
    # label(n) = min(n, min neighbor) — one aggregate over the edge list
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("src"), F.col("mn")).alias("label"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_iterations):
        # propagate each node's label to its neighbors, keep the min seen
        nbr = edges.join(
            labels.select(F.col("src").alias("dst"), F.col("label")), "dst"
        ).select("src", "label")
        labels = (
            nbr.union(labels.select("src", "label"))
            .groupBy("src")
            .agg(F.min("label").alias("label"))
        )
        labels = labels.localCheckpoint()
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            edges.unpersist()
            return labels.select(
                F.col("src").alias(node_col), F.col("label").alias(comp_col)
            )
        prev_sum = cur_sum

    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations; "
        "a component's diameter exceeds the budget — raise max_iterations or "
        "switch to the large-star/small-star formulation for chain-heavy graphs"
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster roll-up of :func:`connected_components`: one row per
    component with its size and canonical (minimum) member id.  Keep rows
    of the corpus whose id joins ``component`` (or anti-join the
    non-canonical members) to deduplicate."""
    cc = connected_components(pairs, id_a, id_b, max_iterations)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").alias("canonical_id"),
    )
