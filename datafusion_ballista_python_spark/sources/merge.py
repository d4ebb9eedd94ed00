"""MERGE / upsert semantics for parquet corpora — the incremental-update
path a living training corpus needs (new crawl batches, takedown deletes,
re-scored documents) without rewriting 100 TB.

Two layers:

- :func:`merge_frames` — pure DataFrame MERGE semantics (upsert + delete),
  usable inside any plan and oracle-checkable;
- :func:`merge_into_path` — copy-on-write against a hive-partitioned
  parquet table, rewriting ONLY the partitions the update batch touches
  (Spark's dynamic partition overwrite); untouched partition files are
  left byte-identical on disk.

Scale: the merge itself is one anti-join on the key (hash shuffle both
sides, AQE broadcasts a small update batch); the copy-on-write cost is
O(touched partitions), not O(table) — the update batch's partition list
is collected once (bounded by the partition count, thousands not
billions) and pushed down as a partition-pruning filter on the target
scan.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_frames(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    delete_col: Optional[str] = None,
) -> DataFrame:
    """SQL ``MERGE`` on DataFrames: every target row whose ``key`` appears
    in ``updates`` is replaced by the update row (upsert); update rows
    with ``delete_col`` true delete the key instead of inserting.

    Column contract: ``updates`` must carry the target's columns (plus
    the optional ``delete_col``); output has exactly the target schema.
    Precondition: at most ONE update row per key — SQL MERGE rejects
    multiple source matches, and this lazy composition would otherwise
    union both copies; :func:`merge_into_path` validates this eagerly.

    Shuffle shape: ONE left-anti join on the key (update batches are
    usually MBs against a TB table — AQE broadcasts them and the anti
    join ships no table bytes) plus a union with the surviving updates.
    """
    if delete_col is not None:
        deletes = updates.where(F.col(delete_col))
        upserts = updates.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
        gone = deletes.select(key).union(upserts.select(key))
    else:
        upserts = updates
        gone = updates.select(key)
    kept = target.join(gone, key, "left_anti")
    return kept.unionByName(upserts.select(*target.columns))


def merge_into_path(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
    delete_col: Optional[str] = None,
    checkpoint: str = "local",
) -> list:
    """Copy-on-write MERGE into a hive-partitioned parquet table: only the
    touched partitions are read, merged and rewritten (dynamic partition
    overwrite); every other partition's files stay untouched on disk.
    Returns the touched partition values (sorted).

    Touched = the update batch's partition values UNION the partitions
    where the updated/deleted keys CURRENTLY live — without the second
    set, an update that moves a row across partitions would leave the
    stale copy behind (duplicate key), and a delete would never find its
    row.  The current-location lookup is a column-pruned
    (key, partition) scan semi-joined to the broadcast update keys; at
    real scale keep a key->partition index to skip it.

    Rejects update batches with duplicate keys (SQL MERGE's "multiple
    source rows match" error) — silently unioning both copies would break
    the key invariant the operation exists to maintain.

    Partitions whose merged output is EMPTY (a takedown that deletes a
    whole partition) are removed explicitly: dynamic overwrite only
    rewrites partitions present in the output, so an empty partition
    would otherwise silently keep its old files.

    ``checkpoint``: how the two internal snapshots (the pinned update
    batch, the merged partitions) are materialized — ``"local"``
    (executor blocks, default) or ``"reliable"`` (the registered
    ``setCheckpointDir`` DFS path; survives executor loss on preemptible
    clusters).  See operators/_ckpt.py.
    """
    from ..operators._ckpt import make_checkpointer

    # eager=True: both checkpoints here guard SIDE EFFECTS — the update
    # batch must be pinned before any of the 4+ actions reads it, and the
    # merged partitions must be fully materialized before their source
    # directories are deleted/overwritten below
    ckpt = make_checkpointer(checkpoint, eager=True)
    # Pin the update batch ONCE: merge_into_path drives 4+ separate actions
    # off this frame (dup check, partition collect, current-location semi
    # join, merge/write).  A nondeterministic source (unordered limit,
    # sample, shuffled input) could pass the dup check yet resolve to
    # different rows at write time, fabricating duplicate keys or a wrong
    # touched set — the eager checkpoint materializes one snapshot all
    # internal actions share (bounded: update batches are MBs, not the
    # table).
    updates = ckpt(updates)
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"updates contain multiple rows for {key}={dup[0][0]!r}: "
            "SQL MERGE forbids multiple source matches per key"
        )
    upd_parts = {r[0] for r in updates.select(partition_col).distinct().collect()}
    current = (
        spark.read.parquet(path)
        .select(key, partition_col)
        .join(F.broadcast(updates.select(key).distinct()), key, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    )
    # NULL partition values are real (Spark writes them as
    # __HIVE_DEFAULT_PARTITION__): sorted() on a mixed None/str set
    # raises TypeError, and isin([... None ...]) is NULL (never true) —
    # the stale null-partition rows would survive every merge.  Sort
    # None-first explicitly and read nulls back with an isNull branch.
    touched = sorted(
        upd_parts | {r[0] for r in current}, key=lambda p: (p is not None, p)
    )
    non_null = [p for p in touched if p is not None]
    read_cond = F.col(partition_col).isin(non_null)
    if len(non_null) < len(touched):
        read_cond = read_cond | F.col(partition_col).isNull()
    target = spark.read.parquet(path).where(read_cond)
    merged = merge_frames(target, updates, key, delete_col=delete_col)
    # Spark refuses to overwrite a path it is still lazily reading
    # (read-before-write hazard); the checkpoint materializes the merged
    # partitions — bounded by the TOUCHED partitions, not the table — and
    # severs the lineage so the overwrite is safe.  (A production variant
    # with huge single partitions would stage to a sibling dir + rename.)
    merged = ckpt(merged)
    # dynamic overwrite only rewrites partitions PRESENT in the output; a
    # touched partition with zero surviving rows (whole-partition takedown)
    # must be deleted explicitly or its old files silently survive.  Delete
    # BEFORE the overwrite commit: a crash in the window between the two
    # steps then leaves takedowns applied and upserts pending — a re-run of
    # the same merge converges — instead of the reverse order's hazard of
    # silently RESURRECTING a fully-deleted partition (compliance risk).
    # merged is already checkpointed, so deleting source dirs is safe.
    surviving = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    _delete_partition_dirs(
        spark, path, partition_col,
        sorted(set(touched) - surviving, key=lambda p: (p is not None, p)),
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return touched


# Characters Hive/Spark escape in partition paths (ExternalCatalogUtils.
# escapePathName): control chars plus this printable set — note '{', '[',
# ']', '^' are escaped but '}' is NOT (verified against the Spark JVM).  A
# raw value like 'a/b' or '12:30' otherwise builds a path that never
# matches the directory Spark actually wrote, so cleanup would silently
# skip it.  _escape_partition_value asks Spark's OWN escapePathName first
# so the cleanup path can never drift from what the writer produced; this
# set is only the JVM-less fallback.
_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^\x7f') | {chr(i) for i in range(32)}


def _escape_partition_value(v, spark=None) -> str:
    if v is None:
        # Spark writes NULL partition values to this reserved dir name
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    if spark is not None:
        try:
            return (
                spark.sparkContext._jvm.org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.escapePathName(s)
            )
        except Exception:
            pass
    return "".join(f"%{ord(ch):02X}" if ch in _ESCAPE_CHARS else ch for ch in s)


def _delete_partition_dirs(spark, path: str, partition_col: str, values: list) -> None:
    """Remove hive partition directories via the Hadoop FS API (works for
    local paths and hdfs/s3a alike)."""
    if not values:
        return
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for v in values:
        p = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{partition_col}={_escape_partition_value(v, spark)}"
        )
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Corpus snapshot diff: classify every key across two table versions
    as ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the audit a
    living corpus runs between ingest cycles (what did this week's crawl
    + takedowns + re-scores actually touch?) and the input to incremental
    downstream recomputation (re-embed only ``added``+``changed``).

    ``compare_cols`` defaults to every shared non-key column.  Change
    detection hashes the compared columns with xxhash64 on EACH SIDE
    (column order fixed by the caller's list or sorted shared names), so
    the full outer join ships two longs per row, not the row bodies —
    the diff of two 100 TB snapshots moves O(keys) bytes, and the join
    is the only shuffle.  NULL-safe: a NULL field hashes like any other
    value; a key present on both sides with all compared fields equal is
    ``unchanged``.

    Returns ``(key, status)`` — one row per key in either snapshot.
    Aggregate ``groupBy("status").count()`` for the release-note summary;
    join back to ``new`` on the added/changed keys for the work list.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c != key and c in set(new.columns)]
        compare_cols = sorted(shared)
    if not compare_cols:
        raise ValueError("no columns to compare — pass compare_cols")

    def hashed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.xxhash64(*[F.col(c) for c in compare_cols]).alias(f"__h_{side}"),
        )

    j = hashed(old, "o").join(hashed(new, "n"), key, "full_outer")
    return j.select(
        key,
        F.when(F.col("__h_o").isNull(), F.lit("added"))
        .when(F.col("__h_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") == F.col("__h_n"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
