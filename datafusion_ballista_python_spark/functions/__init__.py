"""Scalar / aggregate / window functions with reference-parity names.

Complete bound list per reference ``src/functions.rs`` (SURVEY §2.9): every
function here maps to a JVM-side Catalyst expression (whole-stage codegen)
except the blake2/blake3 arms of ``digest``, which fall back to an
Arrow-batched pandas UDF — UDFs are the slow path, so only semantics Spark
genuinely lacks go there.

Semantic-gap shims (documented deviations, SURVEY §7):
- ``concat`` ignores NULLs like DataFusion (reference src/functions.rs:72-79),
  unlike Spark's NULL-propagating concat -> implemented with concat_ws('').
- ``date_bin`` (src/functions.rs:283) has no Spark builtin -> epoch-micros
  floor arithmetic, still codegen'd.
- numeric ``trunc`` (src/functions.rs:286) -> sign*floor(abs) composition.
- ``current_time`` (src/functions.rs:278) -> HH:mm:ss string.
- ``regexp_match`` (src/functions.rs:222) -> regexp_extract_all (returns all
  matches rather than first-match capture groups; documented).
- ``log`` single-arg is base-10 (DataFusion/Postgres semantics), ``ln`` natural.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import pyarrow as pa
from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..errors import BallistaError
from ..expression import Expression, to_column

__all__: list[str] = []


def _export(fn):
    __all__.append(fn.__name__)
    return fn


def _c(x: Any) -> Column:
    return to_column(x)


def _l(x: Any) -> Column:
    """Literal-position arg: bare python strings are literals here (pad
    chars, delimiters, search patterns), not column references."""
    if isinstance(x, Expression):
        return x.column
    if isinstance(x, Column):
        return x
    return F.lit(x)


def _wrap1(name: str, spark_fn):
    def fn(x) -> Expression:
        return Expression(spark_fn(_c(x)))

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__doc__ = f"Reference-parity scalar fn ``{name}`` (src/functions.rs)."
    __all__.append(name)
    return fn


# ---------------------------------------------------------------------------
# column / literal constructors (src/functions.rs:29-37, ballista/__init__.py)
# ---------------------------------------------------------------------------

@_export
def col(name: str) -> Expression:
    return Expression(F.col(name))


@_export
def column(name: str) -> Expression:
    return Expression(F.col(name))


@_export
def lit(value: Any) -> Expression:
    """Literal from a python value or pyarrow scalar (ballista/__init__.py:72-78)."""
    if isinstance(value, pa.Scalar):
        value = value.as_py()
    return Expression(F.lit(value))


@_export
def literal(value: Any) -> Expression:
    return lit(value)


@_export
def alias(expr, name: str) -> Expression:
    """Free-function alias (src/functions.rs:104-109)."""
    return Expression(_c(expr).alias(name))


@_export
def order_by(expr, asc: bool = True, nulls_first: bool = True) -> Expression:
    """Free-function sort key (src/functions.rs:92-101)."""
    return Expression(_c(expr)).sort(ascending=asc, nulls_first=nulls_first)


@_export
def in_list(expr, values: Iterable, negated: bool = False) -> Expression:
    """IN-list predicate (src/functions.rs:52-60)."""
    return Expression(_c(expr)).in_list(values, negated)


# ---------------------------------------------------------------------------
# math (src/functions.rs:180-295)
# ---------------------------------------------------------------------------

abs = _wrap1("abs", F.abs)  # noqa: A001
acos = _wrap1("acos", F.acos)
asin = _wrap1("asin", F.asin)
atan = _wrap1("atan", F.atan)
ceil = _wrap1("ceil", F.ceil)
cos = _wrap1("cos", F.cos)
exp = _wrap1("exp", F.exp)
floor = _wrap1("floor", F.floor)
ln = _wrap1("ln", F.log)  # natural log
log10 = _wrap1("log10", F.log10)
log2 = _wrap1("log2", F.log2)
signum = _wrap1("signum", F.signum)
sin = _wrap1("sin", F.sin)
sqrt = _wrap1("sqrt", F.sqrt)
tan = _wrap1("tan", F.tan)


@_export
def atan2(y, x) -> Expression:
    return Expression(F.atan2(_c(y), _c(x)))


@_export
def log(*args) -> Expression:
    """``log(x)`` = base-10 (DataFusion semantics); ``log(base, x)`` two-arg."""
    if len(args) == 1:
        return Expression(F.log10(_c(args[0])))
    base, x = args
    if isinstance(base, (Expression, Column)):
        # F.log's two-arg form only takes a FLOAT base; a column base is
        # ln(x)/ln(base) (the identity F.log applies internally) — the
        # old pass-through of the raw Expression crashed in py4j
        return Expression(F.log(_c(x)) / F.log(_c(base)))
    return Expression(F.log(float(base), _c(x)))


@_export
def power(base, exponent) -> Expression:
    return Expression(F.pow(_c(base), _c(exponent)))


@_export
def pow(base, exponent) -> Expression:  # noqa: A001
    return power(base, exponent)


@_export
def round(x, decimals: int = 0) -> Expression:  # noqa: A001
    return Expression(F.round(_c(x), decimals))


@_export
def trunc(x, decimals: int = 0) -> Expression:
    """Numeric truncation toward zero (src/functions.rs:286); Spark's own
    ``trunc`` is date-oriented so we compose sign*floor(abs(x)*10^d)/10^d."""
    c = _c(x)
    if decimals == 0:
        return Expression(F.signum(c) * F.floor(F.abs(c)))
    scale = 10 ** decimals
    return Expression(F.signum(c) * F.floor(F.abs(c) * F.lit(scale)) / F.lit(scale))


@_export
def random() -> Expression:
    return Expression(F.rand())


# ---------------------------------------------------------------------------
# string (src/functions.rs:180-295)
# ---------------------------------------------------------------------------

ascii = _wrap1("ascii", F.ascii)  # noqa: A001
bit_length = _wrap1("bit_length", F.bit_length)
initcap = _wrap1("initcap", F.initcap)
lower = _wrap1("lower", F.lower)
ltrim = _wrap1("ltrim", F.ltrim)
octet_length = _wrap1("octet_length", F.octet_length)
reverse = _wrap1("reverse", F.reverse)
rtrim = _wrap1("rtrim", F.rtrim)
upper = _wrap1("upper", F.upper)
length = _wrap1("length", F.length)
character_length = _wrap1("character_length", F.length)
char_length = _wrap1("char_length", F.length)
md5 = _wrap1("md5", F.md5)
to_hex = _wrap1("to_hex", F.hex)


@_export
def chr(n) -> Expression:  # noqa: A001
    return Expression(F.char(_c(n)))


@_export
def btrim(s, chars=None) -> Expression:
    if chars is None:
        return Expression(F.trim(_c(s)))
    return Expression(F.call_function("btrim", _c(s), _l(chars)))


@_export
def trim(s, chars=None) -> Expression:
    return btrim(s, chars)


@_export
def concat(*args) -> Expression:
    """NULL-ignoring string concat (reference src/functions.rs:72-79 —
    DataFusion skips NULL args; Spark's concat would return NULL)."""
    return Expression(F.concat_ws("", *[_c(a) for a in args]))


@_export
def concat_ws(sep, *args) -> Expression:
    sep_val = sep if isinstance(sep, str) else _c(sep)
    return Expression(F.concat_ws(sep_val, *[_c(a) for a in args]))


@_export
def left(s, n) -> Expression:
    return Expression(F.call_function("left", _c(s), _c(n)))


@_export
def right(s, n) -> Expression:
    return Expression(F.call_function("right", _c(s), _c(n)))


@_export
def lpad(s, n, pad=" ") -> Expression:
    return Expression(F.call_function("lpad", _c(s), _c(n), _l(pad)))


@_export
def rpad(s, n, pad=" ") -> Expression:
    return Expression(F.call_function("rpad", _c(s), _c(n), _l(pad)))


@_export
def regexp_match(s, pattern) -> Expression:
    """All regexp matches as an array (documented deviation: DataFusion's
    regexp_match returns first-match capture groups, Postgres-style).

    The group index is chosen from the pattern itself: group-less
    patterns extract the WHOLE match (index 0 — Spark's 2-arg
    regexp_extract_all defaults to index 1 and throws REGEX_GROUP_INDEX
    on any group-less pattern the moment a row matches), patterns with a
    capturing group extract group 1 (Postgres regexp_match-style)."""
    idx = 0
    if isinstance(pattern, str):
        import re as _re

        # an unescaped '(' not starting a (?: (?= (?! … construct
        if _re.search(r"(?<!\\)\((?!\?)", pattern):
            idx = 1
    return Expression(
        F.call_function("regexp_extract_all", _c(s), _l(pattern), F.lit(idx))
    )


@_export
def regexp_replace(s, pattern, replacement) -> Expression:
    return Expression(F.regexp_replace(_c(s), _l(pattern), _l(replacement)))


@_export
def repeat(s, n) -> Expression:
    return Expression(F.call_function("repeat", _c(s), _c(n)))


@_export
def replace(s, search, repl) -> Expression:
    return Expression(F.call_function("replace", _c(s), _l(search), _l(repl)))


@_export
def split_part(s, delimiter, n) -> Expression:
    return Expression(F.call_function("split_part", _c(s), _l(delimiter), _c(n)))


@_export
def starts_with(s, prefix) -> Expression:
    return Expression(F.call_function("startswith", _c(s), _l(prefix)))


@_export
def strpos(s, substring) -> Expression:
    """1-based position of substring (0 when absent)."""
    return Expression(F.call_function("instr", _c(s), _l(substring)))


@_export
def substr(s, start, length=None) -> Expression:
    if length is None:
        return Expression(F.call_function("substr", _c(s), _c(start)))
    return Expression(F.call_function("substr", _c(s), _c(start), _c(length)))


@_export
def translate(s, frm, to) -> Expression:
    return Expression(F.call_function("translate", _c(s), _l(frm), _l(to)))


# ---------------------------------------------------------------------------
# crypto / hash (src/functions.rs:62-70, 214-250)
# ---------------------------------------------------------------------------

@_export
def sha224(x) -> Expression:
    return Expression(F.sha2(_c(x), 224))


@_export
def sha256(x) -> Expression:
    return Expression(F.sha2(_c(x), 256))


@_export
def sha384(x) -> Expression:
    return Expression(F.sha2(_c(x), 384))


@_export
def sha512(x) -> Expression:
    return Expression(F.sha2(_c(x), 512))


@_export
def digest(value, method) -> Expression:
    """``digest(value, method)`` -> binary digest (src/functions.rs:62-70).

    md5/sha224/sha256/sha384/sha512 stay JVM-side (unhex of the hex builtins);
    blake2b/blake2s go through a pandas UDF (hashlib); blake3 through the
    same UDF path using the bundled pure-Python spec implementation
    (functions/blake3.py) — parity arms, not the 100 TB fingerprint path.
    """
    if isinstance(method, (Expression, Column)):
        raise BallistaError("digest method must be a python string literal")
    m = str(method).lower()
    c = _c(value)
    if m == "md5":
        return Expression(F.unhex(F.md5(c)))
    if m in ("sha224", "sha256", "sha384", "sha512"):
        return Expression(F.unhex(F.sha2(c, int(m[3:]))))
    # binary inputs hash their RAW bytes, matching the JVM md5/sha arms —
    # str(v).encode() on bytes would hash the Python repr ("b'\\x00…'"),
    # silently diverging from the other digest methods on the same column
    def _raw(v):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return str(v).encode()

    if m in ("blake2b", "blake2s"):
        import warnings

        def _blake(s):
            import hashlib

            h = getattr(hashlib, m)
            return s.map(lambda v: None if v is None else h(_raw(v)).digest())

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            pudf = F.pandas_udf(_blake, returnType="binary")
        return Expression(pudf(c))
    if m == "blake3":
        import warnings

        def _b3(s):
            from .blake3 import blake3_digest

            return s.map(lambda v: None if v is None else blake3_digest(_raw(v)))

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            pudf = F.pandas_udf(_b3, returnType="binary")
        return Expression(pudf(c))
    raise BallistaError(f"unsupported digest method {method!r}")


# ---------------------------------------------------------------------------
# conditional / misc (src/functions.rs:201, 290, 294)
# ---------------------------------------------------------------------------

@_export
def coalesce(*args) -> Expression:
    return Expression(F.coalesce(*[_c(a) for a in args]))


@_export
def nullif(a, b) -> Expression:
    return Expression(F.call_function("nullif", _c(a), _c(b)))


@_export
def arrow_typeof(x) -> Expression:
    """Spark type name of the expression (deviation: arrow names differ)."""
    return Expression(F.call_function("typeof", _c(x)))


@_export
def uuid() -> Expression:
    """RFC-4122 v4 UUID string per row, volatile (fresh value every row,
    never constant-folded).  Closes the reference's one commented-out
    constructor (src/functions.rs:291 — `uuid` is macro-disabled there,
    same as `struct`); DataFusion's own uuid() has identical semantics."""
    return Expression(F.expr("uuid()"))


@_export
def when(condition, value) -> Expression:
    return Expression(F.when(_c(condition), _c(value)))


# ---------------------------------------------------------------------------
# date / time (src/functions.rs:272-293)
# ---------------------------------------------------------------------------

@_export
def now() -> Expression:
    return Expression(F.current_timestamp())


@_export
def current_date() -> Expression:
    return Expression(F.current_date())


@_export
def current_time() -> Expression:
    """HH:mm:ss string — Spark has no time-of-day type (SURVEY §1.3)."""
    return Expression(F.date_format(F.current_timestamp(), "HH:mm:ss"))


@_export
def to_timestamp(x, fmt=None) -> Expression:
    if fmt is None:
        return Expression(F.to_timestamp(_c(x)))
    return Expression(F.to_timestamp(_c(x), fmt))


@_export
def to_timestamp_seconds(x) -> Expression:
    """Epoch-seconds (numeric) or parseable string -> timestamp truncated to s."""
    c = _c(x)
    return Expression(F.timestamp_seconds(F.unix_timestamp(F.to_timestamp(c))))


@_export
def to_timestamp_millis(x) -> Expression:
    c = _c(x)
    return Expression(
        F.timestamp_millis((F.unix_micros(F.to_timestamp(c)) / 1000).cast("long"))
    )


@_export
def to_timestamp_micros(x) -> Expression:
    return Expression(F.to_timestamp(_c(x)))


@_export
def from_unixtime(x) -> Expression:
    return Expression(F.timestamp_seconds(_c(x).cast("long")))


@_export
def date_part(part, x) -> Expression:
    if isinstance(part, (Expression, Column)):
        return Expression(F.call_function("date_part", _c(part), _c(x)))
    return Expression(F.call_function("date_part", F.lit(str(part)), _c(x)))


@_export
def datepart(part, x) -> Expression:
    return date_part(part, x)


@_export
def date_trunc(granularity, x) -> Expression:
    g = granularity if isinstance(granularity, str) else str(granularity)
    return Expression(F.date_trunc(g, _c(x)))


@_export
def datetrunc(granularity, x) -> Expression:
    return date_trunc(granularity, x)


@_export
def date_bin(stride_seconds, source, origin=None) -> Expression:
    """Bin timestamps into fixed-width buckets (src/functions.rs:283).

    Spark has no date_bin builtin; implemented as epoch-micros floor
    arithmetic — pure Catalyst expressions, whole-stage codegen'd, no UDF.
    ``stride_seconds`` may be an int/float seconds or a string like
    '15 minutes' / '1 hour' / '2 days'.
    """
    stride_us = _parse_stride_micros(stride_seconds)
    src = _c(source)
    src_us = F.unix_micros(src.cast("timestamp"))
    if origin is not None:
        origin_us = F.unix_micros(_c(origin).cast("timestamp"))
    else:
        origin_us = F.lit(0).cast("long")
    binned = origin_us + F.floor((src_us - origin_us) / stride_us).cast("long") * F.lit(stride_us)
    return Expression(F.timestamp_micros(binned).cast("timestamp_ntz"))


def _parse_stride_micros(stride) -> int:
    if isinstance(stride, (int, float)):
        return int(stride * 1_000_000)
    s = str(stride).strip().lower()
    parts = s.split()
    if len(parts) != 2:
        raise BallistaError(f"cannot parse stride {stride!r}; use e.g. '15 minutes'")
    n = float(parts[0])
    unit = parts[1].rstrip("s")
    mult = {
        "microsecond": 1,
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 7 * 86_400_000_000,
    }.get(unit)
    if mult is None:
        raise BallistaError(f"unsupported stride unit {unit!r}")
    return int(n * mult)


# ---------------------------------------------------------------------------
# array / struct (src/functions.rs:288-292)
# ---------------------------------------------------------------------------

@_export
def make_array(*args) -> Expression:
    return Expression(F.array(*[_c(a) for a in args]))


@_export
def array(*args) -> Expression:
    return make_array(*args)


@_export
def struct(*args) -> Expression:
    """Bonus: struct constructor (commented out in reference src/functions.rs:292)."""
    return Expression(F.struct(*[_c(a) for a in args]))


# ---------------------------------------------------------------------------
# aggregates (src/functions.rs:158-178, 297-302) — macro aggregate_function!
# ---------------------------------------------------------------------------

@_export
def avg(x, distinct: bool = False) -> Expression:
    c = _c(x)
    if distinct:
        # avg(DISTINCT x) == sum(DISTINCT x)/count(DISTINCT x); stays JVM-side
        return Expression(F.sum_distinct(c) / F.count_distinct(c))
    return Expression(F.avg(c))


@_export
def count(x, distinct: bool = False) -> Expression:
    c = _c(x)
    return Expression(F.count_distinct(c) if distinct else F.count(c))


@_export
def count_star() -> Expression:
    """COUNT(1) (src/functions.rs:40-50)."""
    return Expression(F.count(F.lit(1)))


@_export
def max(x) -> Expression:  # noqa: A001
    return Expression(F.max(_c(x)))


@_export
def min(x) -> Expression:  # noqa: A001
    return Expression(F.min(_c(x)))


@_export
def sum(x, distinct: bool = False) -> Expression:  # noqa: A001
    c = _c(x)
    return Expression(F.sum_distinct(c) if distinct else F.sum(c))


@_export
def approx_distinct(x) -> Expression:
    """HLL distinct-count estimate (src/functions.rs:302)."""
    return Expression(F.approx_count_distinct(_c(x)))


# extended aggregates (SQL-reachable in the reference via DataFusion dialect)
stddev = _wrap1("stddev", F.stddev)
variance = _wrap1("variance", F.variance)
median = _wrap1("median", F.median)


@_export
def corr(x, y) -> Expression:
    return Expression(F.corr(_c(x), _c(y)))


@_export
def covar_samp(x, y) -> Expression:
    return Expression(F.covar_samp(_c(x), _c(y)))


@_export
def array_agg(x) -> Expression:
    return Expression(F.collect_list(_c(x)))


@_export
def approx_percentile_cont(x, percentile: float) -> Expression:
    return Expression(F.percentile_approx(_c(x), percentile))


# ---------------------------------------------------------------------------
# window constructor (src/functions.rs:111-138)
# ---------------------------------------------------------------------------

_WINDOW_FUNCS = {
    "row_number": lambda args: F.row_number(),
    "rank": lambda args: F.rank(),
    "dense_rank": lambda args: F.dense_rank(),
    "percent_rank": lambda args: F.percent_rank(),
    "cume_dist": lambda args: F.cume_dist(),
    "ntile": lambda args: F.ntile(int(args[0]) if args else 1),
    "lag": lambda args: F.lag(_c(args[0]), int(args[1]) if len(args) > 1 else 1,
                              args[2] if len(args) > 2 else None),
    "lead": lambda args: F.lead(_c(args[0]), int(args[1]) if len(args) > 1 else 1,
                                args[2] if len(args) > 2 else None),
    "first_value": lambda args: F.first(_c(args[0])),
    "last_value": lambda args: F.last(_c(args[0])),
    "nth_value": lambda args: F.nth_value(_c(args[0]), int(args[1])),
}

_RANK_FAMILY = {"row_number", "rank", "dense_rank", "percent_rank", "cume_dist", "ntile"}

_AGG_AS_WINDOW = {
    "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count,
    "stddev": F.stddev, "variance": F.variance,
}


@_export
def window(
    name: str,
    args: list,
    partition_by: Optional[list] = None,
    order_by: Optional[list] = None,
) -> Expression:
    """Generic window-function constructor (src/functions.rs:111-138).

    Resolves ``name`` against built-in window functions plus any aggregate
    usable as a window function (DataFusion ``find_df_window_func`` behavior).
    Frame semantics: with order_by -> RANGE UNBOUNDED PRECEDING..CURRENT ROW
    (both engines' default); without -> whole-partition frame.

    Unlike the reference (which panics on unknown names, functions.rs:119)
    this raises ``BallistaError``.  Rank-family functions require order_by in
    Spark — a clear error replaces DataFusion's arbitrary-order result
    (SURVEY §7 known-hard #5).
    """
    args = args or []
    lname = name.lower()
    if lname in _WINDOW_FUNCS:
        if lname in _RANK_FAMILY and not order_by:
            raise BallistaError(
                f"window function {name!r} requires order_by in Spark "
                "(DataFusion would produce an arbitrary order)"
            )
        base = _WINDOW_FUNCS[lname](args)
    elif lname in _AGG_AS_WINDOW:
        base = _AGG_AS_WINDOW[lname](_c(args[0]))
    else:
        raise BallistaError(f"unknown window function {name!r}")

    w = Window.partitionBy(*[_c(p) for p in (partition_by or [])])
    if order_by:
        w = w.orderBy(*[_c(o) for o in order_by])
    return Expression(base.over(w))
