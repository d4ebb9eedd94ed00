"""Function semantics: null-ignoring concat, date_bin, trunc, digest,
window guard rails, avg-distinct identity (SURVEY §2.9 shims)."""

import pyarrow as pa
import pytest

from ballista import BallistaError, col, lit
import ballista.functions as f


@pytest.fixture(scope="module")
def mini(ctx):
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2, 3, 4]),
            pa.array(["a", None, "c", "d"]),
            pa.array([1.5, -2.7, 3.14159, -0.5]),
        ],
        names=["i", "s", "x"],
    )
    return ctx.create_dataframe([[batch]])


def _one_col(df, name):
    return pa.Table.from_batches(df.collect()).sort_by("i" if "i" in pa.Table.from_batches(df.collect()).column_names else name).column(name).to_pylist()


def test_concat_ignores_nulls(mini):
    out = pa.Table.from_batches(
        mini.select(col("i"), f.concat(lit("x"), col("s"), lit("y")).alias("c")).collect()
    ).sort_by("i")
    assert out.column("c").to_pylist() == ["xay", "xy", "xcy", "xdy"]


def test_trunc_toward_zero(mini):
    out = pa.Table.from_batches(
        mini.select(col("i"), f.trunc(col("x")).alias("t")).collect()
    ).sort_by("i")
    assert out.column("t").to_pylist() == [1.0, -2.0, 3.0, -0.0]


def test_trunc_decimals(mini):
    out = pa.Table.from_batches(
        mini.select(col("i"), f.trunc(col("x"), 2).alias("t")).collect()
    ).sort_by("i")
    assert out.column("t").to_pylist() == [1.5, -2.7, 3.14, -0.5]


def test_date_bin_hour(ctx):
    batch = pa.RecordBatch.from_arrays(
        [pa.array([0, 1]), pa.array(["2024-03-01 10:47:13", "2024-03-01 23:59:59"])],
        names=["i", "ts_str"],
    )
    df = ctx.create_dataframe([[batch]]).with_column(
        "b", f.date_bin("1 hour", f.to_timestamp(col("ts_str")))
    )
    out = pa.Table.from_batches(df.collect()).sort_by("i")
    vals = [str(v) for v in out.column("b").to_pylist()]
    assert vals == ["2024-03-01 10:00:00", "2024-03-01 23:00:00"]


def test_date_bin_origin_offset(ctx):
    batch = pa.RecordBatch.from_arrays([pa.array([0]), pa.array(["2024-03-01 10:47:00"])], names=["i", "t"])
    df = ctx.create_dataframe([[batch]]).with_column(
        "b",
        f.date_bin("1 hour", f.to_timestamp(col("t")), f.to_timestamp(lit("2024-01-01 00:30:00"))),
    )
    out = pa.Table.from_batches(df.collect())
    assert str(out.column("b").to_pylist()[0]) == "2024-03-01 10:30:00"


def test_digest_md5_binary(mini):
    out = pa.Table.from_batches(
        mini.filter(col("s").is_null() == lit(False))
        .select(col("i"), f.digest(col("s"), "md5").alias("d"))
        .collect()
    )
    vals = out.column("d").to_pylist()
    assert all(isinstance(v, bytes) and len(v) == 16 for v in vals)


def test_digest_bad_method(mini):
    with pytest.raises(BallistaError, match="unsupported digest method"):
        f.digest(col("s"), "crc999")


def test_digest_blake3_matches_spec_vector(mini):
    # official vector: blake3("abc") (reference digest surface,
    # src/functions.rs:62-70)
    out = pa.Table.from_batches(
        mini.filter(col("s") == lit("a"))
        .select(col("i"), f.digest(lit("abc"), "blake3").alias("d"))
        .collect()
    )
    assert out.column("d").to_pylist()[0].hex() == (
        "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )


def test_blake3_multi_chunk_pure():
    from datafusion_ballista_python_spark.functions.blake3 import blake3_digest

    # single- vs multi-chunk boundaries all produce 32 bytes and differ
    hs = {blake3_digest(b"x" * n).hex() for n in (0, 1, 1024, 1025, 2048, 5000)}
    assert len(hs) == 6
    assert blake3_digest(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )


def test_window_unknown_name():
    with pytest.raises(BallistaError, match="unknown window function"):
        f.window("not_a_fn", [], order_by=[col("i")])


def test_window_rank_requires_order():
    with pytest.raises(BallistaError, match="requires order_by"):
        f.window("row_number", [])


def test_avg_distinct(mini, ctx):
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1.0, 1.0, 3.0, 5.0])], names=["v"]
    )
    df = ctx.create_dataframe([[batch]])
    out = pa.Table.from_batches(
        df.aggregate([], [f.avg(col("v"), distinct=True).alias("a")]).collect()
    )
    assert out.column("a").to_pylist()[0] == pytest.approx(3.0)


def test_in_list_negated(mini):
    kept = mini.filter(f.in_list(col("i"), [1, 2], negated=True))
    assert kept.count() == 2


def test_case_insensitive_function_names():
    # reference exposes both pow/power, datepart/date_part, datetrunc/date_trunc
    assert f.pow is not None and f.power is not None
    assert callable(f.datepart) and callable(f.date_part)
    assert callable(f.datetrunc) and callable(f.date_trunc)


def test_struct_and_array_constructors(mini):
    out = pa.Table.from_batches(
        mini.select(
            col("i"),
            f.make_array(col("i"), col("i") + lit(1)).alias("arr"),
            f.struct(col("i"), col("x")).alias("st"),
        ).collect()
    ).sort_by("i")
    assert out.column("arr").to_pylist()[0] == [1, 2]
    assert out.column("st").to_pylist()[0] == {"i": 1, "x": 1.5}


def test_nested_access(mini):
    df = mini.select(col("i"), f.struct(col("i"), col("x")).alias("st"))
    out = pa.Table.from_batches(df.select(col("i"), df["st"]["x"].alias("inner_x")).collect()).sort_by("i")
    assert out.column("inner_x").to_pylist()[0] == 1.5


def test_regexp_match_groupless_pattern(mini):
    # Spark's 2-arg regexp_extract_all defaults to group 1 and throws
    # REGEX_GROUP_INDEX for group-less patterns the moment a row matches;
    # regexp_match must extract the WHOLE match (group 0) for them
    out = pa.Table.from_batches(
        mini.filter(col("s").is_null() == lit(False))
        .select(col("i"), f.regexp_match(lit("ab12 cd34"), "[0-9]+").alias("m"))
        .collect()
    )
    assert out.column("m").to_pylist()[0] == ["12", "34"]


def test_regexp_match_grouped_pattern_keeps_group_one(mini):
    out = pa.Table.from_batches(
        mini.filter(col("s").is_null() == lit(False))
        .select(col("i"), f.regexp_match(lit("ab12 cd34"), "([a-z]+)[0-9]+").alias("m"))
        .collect()
    )
    assert out.column("m").to_pylist()[0] == ["ab", "cd"]
    # non-capturing groups do NOT count as capture groups
    out2 = pa.Table.from_batches(
        mini.filter(col("s").is_null() == lit(False))
        .select(col("i"), f.regexp_match(lit("ab12 cd34"), "(?:[a-z]+)[0-9]+").alias("m"))
        .collect()
    )
    assert out2.column("m").to_pylist()[0] == ["ab12", "cd34"]


def test_log_with_expression_base(mini):
    # fn.log(expr, x): a column base crashed in py4j (F.log's two-arg
    # form only takes a float base); now ln(x)/ln(base)
    out = pa.Table.from_batches(
        mini.filter(col("s") == lit("a"))
        .select(col("i"), f.log(lit(2.0), lit(8.0)).alias("l"))
        .collect()
    )
    assert abs(out.column("l").to_pylist()[0] - 3.0) < 1e-12


def test_digest_blake_binary_hashes_raw_bytes(mini):
    # binary input must hash the RAW bytes like the md5/sha arms, not the
    # Python repr of the bytes object
    import hashlib

    payload = b"\x00\x01\xff"
    for method in ("blake2b", "blake2s"):
        out = pa.Table.from_batches(
            mini.filter(col("s") == lit("a"))
            .select(f.digest(lit(payload), method).alias("d"))
            .collect()
        )
        want = getattr(hashlib, method)(payload).digest()
        assert out.column("d").to_pylist()[0] == want


def test_uuid_shape_and_per_row_uniqueness(mini):
    """uuid() is volatile: RFC-4122 v4 format, a FRESH value on every row
    (nondeterministic, so no hash oracle — shape test per r6 verdict #8;
    closes the reference's one commented-out constructor,
    src/functions.rs:291)."""
    import re

    out = pa.Table.from_batches(
        mini.select(col("i"), f.uuid().alias("u")).collect()
    )
    vals = out.column("u").to_pylist()
    assert len(vals) == 4 and len(set(vals)) == 4  # unique per row
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    for v in vals:
        assert pat.match(v), v
