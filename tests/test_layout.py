"""Data-layout operators: hive partitioning prunes at the directory level,
compaction bounds file counts, file counts stay controlled on write."""

import os

import pytest

from pyspark.sql import functions as F

from datafusion_ballista_python_spark.plans import partition_filters
from datafusion_ballista_python_spark.sources.layout import (
    compact,
    read_partitioned,
    write_partitioned,
)


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_write_partitioned_prunes_and_bounds_files(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["o_year"])

    back = read_partitioned(spark, path)
    assert back.count() == orders.count()

    years = [r[0] for r in orders.select("o_year").distinct().collect()]
    # one file per partition directory
    assert len(_parquet_files(path)) == len(years)

    filtered = back.filter(F.col("o_year") == years[0])
    pf = partition_filters(filtered)
    assert "o_year" in pf, f"expected partition pruning, got: {pf!r}"
    # pruned read matches the unpartitioned filter
    want = orders.filter(F.col("o_year") == years[0]).count()
    assert filtered.count() == want


def test_write_partitioned_multiple_files(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    path = str(tmp_path / "orders_by_year_4")
    write_partitioned(orders, path, ["o_year"], files_per_partition=4)
    back = read_partitioned(spark, path)
    assert back.count() == orders.count()
    years = orders.select("o_year").distinct().count()
    n = len(_parquet_files(path))
    assert years < n <= 4 * years


def test_compact_refuses_overlapping_out_path(spark, tmp_path):
    import pytest

    p = str(tmp_path / "src")
    for bad in (p, p + "/", p + "/nested", str(tmp_path)):
        with pytest.raises(ValueError, match="overlaps"):
            compact(spark, p, bad)


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(64).write.parquet(frag)
    assert len(_parquet_files(frag)) == 64
    out = str(tmp_path / "compacted")
    compact(spark, frag, out, target_mb=512)
    files = _parquet_files(out)
    assert len(files) < 8
    assert (
        spark.read.parquet(out).count()
        == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    )


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def _files_matching(path, col, value):
    """Count parquet files whose footer min/max range contains value."""
    import pyarrow.parquet as pq

    n_match, n_total = 0, 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        n_total += 1
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = schema_idx[col]
        lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
        if lo <= value <= hi:
            n_match += 1
    return n_match, n_total


def test_write_zordered_prunes_both_dims(spark, sf_dir, tmp_path):
    from datafusion_ballista_python_spark.sources import layout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "z")
    upath = str(tmp_path / "u")
    layout.write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
    li.repartition(16).write.parquet(upath)

    probe_part = li.agg(F.expr("percentile_approx(l_partkey, 0.5)")).collect()[0][0]
    probe_supp = li.agg(F.expr("percentile_approx(l_suppkey, 0.5)")).collect()[0][0]

    zp, zt = _files_matching(zpath, "l_partkey", probe_part)
    zs, _ = _files_matching(zpath, "l_suppkey", probe_supp)
    up, ut = _files_matching(upath, "l_partkey", probe_part)
    us, _ = _files_matching(upath, "l_suppkey", probe_supp)

    # unordered writes leave every file covering ~the full key range (no
    # pruning); z-ordered files cover tight rectangles in BOTH dims
    assert up == ut and us == ut
    assert zp < zt and zs < zt
    assert zp <= zt / 2 and zs <= zt / 2


def test_zorder_wide_int32_range_no_overflow(spark):
    """(x - mn) * 255 on an int32 column whose range exceeds 2^31/255 must
    not wrap: min and max must land on quantized codes 0 and 255, and codes
    must be monotone in the value."""
    from datafusion_ballista_python_spark.sources import layout

    vals = [0, 1, 2**28, 2**30, 2**31 - 10]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, x int"
    )
    z = layout.with_zorder(df, ["x"], bits=8, out_col="z")
    got = {r["x"]: r["z"] for r in z.collect()}
    # single column -> z-value IS the quantized code
    assert got[0] == 0 and got[2**31 - 10] == 255
    codes = [got[v] for v in vals]
    assert codes == sorted(codes), codes
    assert all(0 <= c <= 255 for c in codes)


def test_write_zordered_preserves_rows(spark, sf_dir, tmp_path):
    from datafusion_ballista_python_spark.sources import layout

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    zpath = str(tmp_path / "zfull")
    layout.write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert "__z" not in back.columns
    assert sorted(back.columns) == sorted(li.columns)


# -- copy-on-write MERGE (sources/merge.py) ---------------------------------


def _partition_files(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                part = os.path.relpath(root, path)
                out.setdefault(part, {})[f] = os.path.getmtime(full)
    return out


def test_merge_into_path_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    import time

    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(path)
    before = _partition_files(path)

    updates = (
        docs.where("lang = 'en' AND doc_id < 10")
        .select(
            "doc_id",
            F.concat(F.lit("UPDATED "), F.col("text")).alias("text"),
            F.col("n_chars"),
            "source",
            "lang",
            F.lit(False).alias("is_delete"),
        )
    )
    time.sleep(1.1)  # make mtime changes observable
    touched = merge_into_path(
        spark, path, updates, key="doc_id", partition_col="lang",
        delete_col="is_delete",
    )
    assert touched == ["en"]
    after = _partition_files(path)

    # untouched partitions: identical file sets AND mtimes
    for part in before:
        if part == "lang=en":
            continue
        assert after[part] == before[part], f"{part} was rewritten"
    assert after["lang=en"] != before["lang=en"]

    # merged content: updated rows replaced, everything else intact
    merged = spark.read.parquet(path)
    assert merged.count() == docs.count()
    upd = merged.where("doc_id < 10 AND lang = 'en'").select("text").collect()
    assert upd and all(r["text"].startswith("UPDATED ") for r in upd)
    n_changed = docs.where("lang = 'en' AND doc_id < 10").count()
    assert merged.where(F.col("text").startswith("UPDATED ")).count() == n_changed


def test_merge_into_path_deletes(spark, sf_dir, tmp_path):
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_by_lang_del")
    docs.write.partitionBy("lang").parquet(path)
    victims = docs.where("lang = 'de'").limit(3).withColumn(
        "is_delete", F.lit(True)
    )
    n_victims = victims.count()
    merge_into_path(
        spark, path, victims, key="doc_id", partition_col="lang",
        delete_col="is_delete",
    )
    merged = spark.read.parquet(path)
    assert merged.count() == docs.count() - n_victims


def test_merge_into_path_partition_moving_update_keeps_key_unique(
    spark, sf_dir, tmp_path
):
    """An update that moves a row to a different partition must remove the
    stale copy from the OLD partition (the touched set includes where the
    key currently lives, not just where it is going)."""
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_move")
    docs.write.partitionBy("lang").parquet(path)
    victim = docs.orderBy("doc_id").limit(1).collect()[0]
    new_lang = "fr" if victim["lang"] != "fr" else "de"
    updates = spark.createDataFrame(
        [(victim["doc_id"], victim["text"], new_lang, victim["source"],
          victim["n_chars"])],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    touched = merge_into_path(spark, path, updates, key="doc_id",
                              partition_col="lang")
    assert set(touched) == {victim["lang"], new_lang}
    merged = spark.read.parquet(path)
    rows = merged.where(F.col("doc_id") == victim["doc_id"]).collect()
    assert len(rows) == 1 and rows[0]["lang"] == new_lang
    assert merged.count() == docs.count()


def test_merge_into_path_delete_empties_whole_partition(spark, sf_dir, tmp_path):
    """A takedown that deletes every row of a partition must remove the
    partition's files (dynamic overwrite alone would leave them)."""
    import os as _os

    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_wipe")
    docs.write.partitionBy("lang").parquet(path)
    victims = docs.where("lang = 'de'").withColumn("is_delete", F.lit(True))
    n_de = victims.count()
    merge_into_path(spark, path, victims, key="doc_id", partition_col="lang",
                    delete_col="is_delete")
    merged = spark.read.parquet(path)
    assert merged.where("lang = 'de'").count() == 0
    assert merged.count() == docs.count() - n_de
    assert not _os.path.exists(_os.path.join(path, "lang=de"))


def test_merge_into_path_rejects_duplicate_update_keys(spark, sf_dir, tmp_path):
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_dup")
    docs.write.partitionBy("lang").parquet(path)
    first = docs.orderBy("doc_id").limit(1)
    dup = first.union(first)
    with pytest.raises(ValueError, match="multiple source matches"):
        merge_into_path(spark, path, dup, key="doc_id", partition_col="lang")


def test_merge_into_path_escaped_partition_value_cleanup(spark, tmp_path):
    """Whole-partition takedown where the partition VALUE needs hive path
    escaping (':'): cleanup must target the escaped directory Spark wrote,
    not the raw f-string path (which never exists)."""
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    base = spark.createDataFrame(
        [(1, "a", "l:1"), (2, "b", "l:1"), (3, "c", "plain")],
        ["doc_id", "text", "shard"],
    )
    path = str(tmp_path / "escaped_parts")
    base.write.partitionBy("shard").parquet(path)
    import os

    assert "shard=l%3A1" in os.listdir(path)
    victims = base.where("shard = 'l:1'").withColumn("is_delete", F.lit(True))
    merge_into_path(
        spark, path, victims, key="doc_id", partition_col="shard",
        delete_col="is_delete",
    )
    assert "shard=l%3A1" not in os.listdir(path), "stale escaped dir survived"
    left = spark.read.parquet(path)
    assert [r["doc_id"] for r in left.collect()] == [3]


def test_merge_into_path_nondeterministic_updates_pinned(spark, tmp_path):
    """A nondeterministic update frame (unordered limit over a shuffled
    source) must resolve to ONE snapshot across merge_into_path's internal
    actions — the merged table keeps exactly one row per key."""
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    base = spark.createDataFrame(
        [(i, f"t{i}", f"p{i % 3}") for i in range(30)],
        ["doc_id", "text", "part"],
    )
    path = str(tmp_path / "nondet_updates")
    base.write.partitionBy("part").parquet(path)
    updates = (
        base.repartition(7)
        .withColumn("text", F.concat(F.lit("new-"), F.col("text")))
        .limit(10)  # unordered limit: different rows on each resolution
    )
    merge_into_path(spark, path, updates, key="doc_id", partition_col="part")
    merged = spark.read.parquet(path)
    assert merged.count() == 30
    dup = merged.groupBy("doc_id").count().where("count > 1").collect()
    assert dup == [], f"duplicate keys after merge: {dup}"


def test_merge_into_path_null_partition_values(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__): the old code
    crashed sorting a mixed None/str touched set, and isin() could never
    read the null-partition rows back — stale copies survived merges."""
    from datafusion_ballista_python_spark.sources.merge import merge_into_path

    base = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", None), (3, "c", None), (4, "d", "de")],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "null_parts")
    base.write.partitionBy("lang").parquet(path)

    updates = spark.createDataFrame(
        [(2, "B2", None, False), (4, "D2", None, False)],
        "doc_id long, text string, lang string, is_delete boolean",
    )
    touched = merge_into_path(
        spark, path, updates, key="doc_id", partition_col="lang",
        delete_col="is_delete",
    )
    assert touched[0] is None and set(touched[1:]) == {"de"}
    out = {r["doc_id"]: (r["text"], r["lang"])
           for r in spark.read.parquet(path).collect()}
    # updated in place (2) and moved across partitions into NULL (4),
    # with no stale duplicate left behind
    assert out == {1: ("a", "en"), 2: ("B2", None), 3: ("c", None),
                   4: ("D2", None)}


def test_write_bucketed_overwrite_db_qualified(spark, sf_dir, tmp_path):
    """Orphan-location cleanup must target <warehouse>/<db>.db/<table>
    (lowercased) — the old bare-table path missed it and saveAsTable
    failed with LOCATION_ALREADY_EXISTS on re-runs."""
    from datafusion_ballista_python_spark.sources.bucketing import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS tmpdb")
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    try:
        for _ in range(2):  # second overwrite exercises the cleanup path
            write_bucketed(df, "tmpdb.RegionBuck", ["r_regionkey"],
                           n_buckets=2, mode="overwrite")
        assert spark.table("tmpdb.RegionBuck").count() == df.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS tmpdb.RegionBuck")
        spark.sql("DROP DATABASE IF EXISTS tmpdb")


def test_zorder_interleave_width_guard(spark):
    from datafusion_ballista_python_spark.sources.layout import with_zorder

    df = spark.range(4).selectExpr(*[f"id as c{i}" for i in range(8)])
    with pytest.raises(ValueError, match="exceeding a signed long"):
        with_zorder(df, [f"c{i}" for i in range(8)], bits=8)
    # 8 cols at 7 bits = 56 positions: fine
    assert with_zorder(df, [f"c{i}" for i in range(8)], bits=7).count() == 4
