"""Deterministic-sampling invariants: partition-layout independence is the
whole point of hash-based sampling (seeded df.sample does NOT have it)."""

from pyspark.sql import functions as F

from datafusion_ballista_python_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)


def _ids(df, col="o_orderkey"):
    return sorted(r[0] for r in df.select(col).collect())


def test_hash_sample_partition_invariant(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = _ids(hash_sample(orders, "o_orderkey", 0.1))
    re13 = _ids(hash_sample(orders.repartition(13), "o_orderkey", 0.1))
    re1 = _ids(hash_sample(orders.coalesce(1), "o_orderkey", 0.1))
    assert base == re13 == re1
    assert len(base) > 0


def test_hash_sample_fraction_roughly_holds(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = orders.count()
    got = hash_sample(orders, "o_orderkey", 0.2).count()
    assert 0.1 * total < got < 0.3 * total


def test_hash_sample_bounds_are_exact(spark):
    import pytest

    df = spark.range(100)
    assert hash_sample(df, "id", 0.0).count() == 0
    assert hash_sample(df, "id", 1.0).count() == 100
    # fractions that ROUND to 16^4 must also mean "keep all", not a
    # lexicographic 5-char cutoff that silently keeps ~6%
    assert hash_sample(df, "id", 0.9999999).count() == 100
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


def test_stratified_sample_exact_n_and_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "lang", "doc_id", 7)
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    per_stratum = {r["lang"]: r["n"] for r in
                   docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(7, per_stratum[lang])
    out2 = stratified_sample(docs.repartition(13), "lang", "doc_id", 7)
    assert sorted(map(tuple, out.select("lang", "doc_id").collect())) == sorted(
        map(tuple, out2.select("lang", "doc_id").collect())
    )


def test_weighted_sample_prefers_heavy_rows(spark):
    from datafusion_ballista_python_spark.operators.sampling import weighted_sample

    # 200 light rows (w=1) + 20 heavy rows (w=100): a 30-row draw should
    # be dominated by heavy rows under weight-proportional sampling
    rows = [(i, 1.0) for i in range(200)] + [(1000 + i, 100.0) for i in range(20)]
    df = spark.createDataFrame(rows, ["k", "w"])
    out = weighted_sample(df, "w", "k", n=30).collect()
    heavy = sum(1 for r in out if r["k"] >= 1000)
    assert heavy >= 15


def test_weighted_sample_deterministic_across_partitionings(spark):
    from datafusion_ballista_python_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df1 = spark.createDataFrame(rows, ["k", "w"]).repartition(1)
    df8 = spark.createDataFrame(rows, ["k", "w"]).repartition(8)
    s1 = sorted(r["k"] for r in weighted_sample(df1, "w", "k", 25).collect())
    s8 = sorted(r["k"] for r in weighted_sample(df8, "w", "k", 25).collect())
    assert s1 == s8


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from datafusion_ballista_python_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], ["k", "w"])
    out = [r["k"] for r in weighted_sample(df, "w", "k", 10).collect()]
    assert out == [3]


def test_mixture_sample_quotas_and_determinism(spark):
    from datafusion_ballista_python_spark.operators.sampling import mixture_sample

    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = mixture_sample(df, "grp", {"g0": 5, "g1": 2}, "id", default_n=1)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(
        F.count("*").alias("n")
    ).collect()}
    assert counts == {"g0": 5, "g1": 2, "g2": 1}
    # quota above group size keeps the whole group
    out2 = mixture_sample(df, "grp", {"g0": 10_000}, "id", default_n=0)
    assert out2.count() == 20
    # deterministic across partitionings
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, mixture_sample(
        df.repartition(7), "grp", {"g0": 5, "g1": 2}, "id", default_n=1).collect()))
    assert a == b


def test_split_assign_disjoint_stable_and_proportional(spark):
    from datafusion_ballista_python_spark.operators.sampling import split_assign

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    out = split_assign(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000  # disjoint + exhaustive
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    # stable: same assignment on re-run and under different partitioning
    again = split_assign(df.repartition(13), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.join(again.withColumnRenamed("split", "s2"), "k").where(
        "split != s2"
    ).count() == 0


def test_split_assign_validates_fractions(spark):
    import pytest as _pytest

    from datafusion_ballista_python_spark.operators.sampling import split_assign

    df = spark.range(1)
    with _pytest.raises(ValueError):
        split_assign(df, "id", {"a": 0.5, "b": 0.4})
    with _pytest.raises(ValueError):
        split_assign(df, "id", {"a": -0.1, "b": 1.1})
    with _pytest.raises(ValueError):
        split_assign(df, "id", {})  # explicit empty dict is a bug, not a default
    with _pytest.raises(ValueError):
        # zero-fraction split: rounding could silently hand it real rows
        split_assign(df, "id", {"train": 0.9, "val": 0.1, "test": 0.0})


def test_split_assign_rejects_sub_quantum_fraction(spark):
    """Fractions below the 1/65536 hash granularity would silently produce
    an empty split; split_assign must reject them."""
    import pytest

    from datafusion_ballista_python_spark.operators.sampling import split_assign

    df = spark.range(10).selectExpr("cast(id as string) as k")
    with pytest.raises(ValueError, match="quantizes to an empty range"):
        split_assign(df, "k", {"a": 1e-6, "b": 1 - 1e-6})
    # a representable small fraction still works
    out = split_assign(df, "k", {"a": 0.001, "b": 0.999})
    assert set(r["split"] for r in out.collect()) <= {"a", "b"}
