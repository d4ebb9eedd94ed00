"""checkpoint="local" vs "reliable" contract for iterative operators
(VERDICT r7 task 5): the two modes must produce identical results — the
only difference is WHERE the per-round snapshot blocks live (executor
block manager vs the registered DFS checkpoint dir), i.e. executor-loss
resilience, which local-mode tests cannot exercise directly.  What they
CAN assert: result equality, the eager up-front error when no checkpoint
dir is registered, and that reliable mode actually writes checkpoint
files (proof it took the DFS path, not a silent fallback)."""

import os

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_python_spark.errors import BallistaError
from datafusion_ballista_python_spark.operators import graph
from datafusion_ballista_python_spark.operators._ckpt import make_checkpointer


@pytest.fixture()
def ckpt_dir(spark, tmp_path):
    """Register a checkpoint dir for the test, restore the prior state
    after (the session is shared across the whole suite)."""
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    d = str(tmp_path / "reliable_ckpt")
    sc.setCheckpointDir(d)
    yield d
    # there is no unset API; point it back or park it in tmp
    sc.setCheckpointDir(prev if prev else str(tmp_path / "parked"))


def _pairs(spark):
    # two blobs + a chain + a self-loop singleton: exercises every branch
    rows = [
        (1, 2), (2, 3), (1, 3),          # triangle blob
        (10, 11), (11, 12),              # chain
        (20, 20),                        # self-loop singleton
        (30, 31), (31, 32), (30, 32), (32, 33),  # blob with appendage
    ]
    return spark.createDataFrame(rows, ["doc_a", "doc_b"])


def test_reliable_without_dir_raises_eagerly(spark, tmp_path):
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    if prev is not None:
        pytest.skip("session already has a checkpoint dir")
    with pytest.raises(BallistaError, match="setCheckpointDir"):
        make_checkpointer("reliable")(spark.range(1))


def test_unknown_mode_raises(spark):
    with pytest.raises(BallistaError, match="unknown checkpoint mode"):
        graph.kcore(_pairs(spark), k=2, checkpoint="banana")


def test_connected_components_modes_agree(spark, ckpt_dir):
    pairs = _pairs(spark)
    for algo in ("minlabel", "star"):
        local = {
            (r["node"], r["component"])
            for r in graph.connected_components(
                pairs, algorithm=algo, checkpoint="local"
            ).collect()
        }
        reliable = {
            (r["node"], r["component"])
            for r in graph.connected_components(
                pairs, algorithm=algo, checkpoint="reliable"
            ).collect()
        }
        assert local == reliable and local  # non-vacuous


def test_pagerank_modes_agree(spark, ckpt_dir):
    pairs = _pairs(spark)
    local = {
        (r["node"], r["pr"])
        for r in graph.pagerank(pairs, checkpoint="local").collect()
    }
    reliable = {
        (r["node"], r["pr"])
        for r in graph.pagerank(pairs, checkpoint="reliable").collect()
    }
    assert local == reliable and local


def test_pagerank_directed_modes_agree(spark, ckpt_dir):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1)], ["src", "dst"]
    )
    local = {
        (r["node"], r["pr"])
        for r in graph.pagerank_directed(edges, checkpoint="local").collect()
    }
    reliable = {
        (r["node"], r["pr"])
        for r in graph.pagerank_directed(edges, checkpoint="reliable").collect()
    }
    assert local == reliable and local


def test_kcore_modes_agree_and_reliable_writes_files(spark, ckpt_dir):
    pairs = _pairs(spark)
    local = {
        (r["node"], r["core_degree"])
        for r in graph.kcore(pairs, k=2, checkpoint="local").collect()
    }
    reliable = {
        (r["node"], r["core_degree"])
        for r in graph.kcore(pairs, k=2, checkpoint="reliable").collect()
    }
    assert local == reliable and local
    # proof the reliable path hit the DFS dir: checkpoint files exist
    found = any(files for _, _, files in os.walk(ckpt_dir))
    assert found, "reliable mode wrote no checkpoint files"


def test_merge_into_path_reliable(spark, ckpt_dir, tmp_path):
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")], ["k", "v", "p"]
    ).write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame([(2, "B", "p1"), (4, "d", "p2")], ["k", "v", "p"])
    merge_into_path(spark, path, updates, "k", "p", checkpoint="reliable")
    got = {
        (r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
