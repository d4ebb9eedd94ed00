"""Checkpoint-mode plumbing for iterative operators.

Every iterative DataFrame loop in this package (connected components,
PageRank, k-core peel, the MERGE snapshot) must sever lineage each round —
otherwise the plan doubles every pass and both analysis time and recovery
cost blow up.  There are two ways to sever it, with different failure
models:

- ``"local"`` (default): ``DataFrame.localCheckpoint`` — blocks live on
  executor block managers.  Fast (no DFS round-trip), zero configuration,
  and exactly right for local-mode and for clusters with stable executors.
  BUT the blocks have no lineage to recompute from: on a preemptible
  1000-executor cluster, losing an executor mid-iteration kills the job.
- ``"reliable"``: ``DataFrame.checkpoint`` — blocks are written to the
  directory registered via ``spark.sparkContext.setCheckpointDir`` (HDFS/
  S3/any DFS).  Survives executor loss; costs one DFS write per round.
  This is the mode to run on preemptible / autoscaled clusters.

Operators take ``checkpoint="local"|"reliable"`` and resolve it once via
:func:`make_checkpointer`; the returned callable replaces every bare
``df.localCheckpoint()`` in the loop body, so the two modes are otherwise
byte-identical code paths (a contract test asserts identical results).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..errors import BallistaError

CHECKPOINT_MODES = ("local", "reliable")


def make_checkpointer(
    checkpoint: str = "local",
) -> Callable[[DataFrame], DataFrame]:
    """Resolve a checkpoint mode name to a ``df -> materialized df``
    callable.  ``"reliable"`` validates up front that a checkpoint
    directory is registered — failing at round 1 with a clear message
    beats Spark's mid-job ``SparkException`` after minutes of work."""
    if checkpoint == "local":
        return lambda df: df.localCheckpoint()
    if checkpoint == "reliable":

        def _reliable(df: DataFrame) -> DataFrame:
            sc = df.sparkSession.sparkContext
            if sc.getCheckpointDir() is None:
                raise BallistaError(
                    "checkpoint='reliable' needs a checkpoint directory: "
                    "call spark.sparkContext.setCheckpointDir('<dfs path>') "
                    "first (an HDFS/S3 path on a real cluster)"
                )
            return df.checkpoint(eager=True)

        return _reliable
    raise BallistaError(
        f"unknown checkpoint mode {checkpoint!r}: use 'local' or 'reliable'"
    )
