#!/usr/bin/env python
"""Vacuity audit: run every corpus entry and flag degenerate result shapes.

A corpus entry whose oracle hash-matches can still be VACUOUS — the
round-6 review found `fn_regexp_ops` matching zero documents, which made
its extract-all arm trivially green while hiding a real crash.  This tool
mechanically hunts that class across all entries:

  - empty result (0 rows)
  - columns that are entirely NULL
  - boolean columns that are constant (a flag arm never exercised)
  - string columns that are entirely empty
  - numeric columns that are constant zero
  - float columns containing IEEE -0.0 (NEG_ZERO — bit-divergent under
    the driver's value hash while ==-equal; the r7-r9 dq_mad_outlier_gate
    red streak's actual cause.  Fold with `+ F.lit(0.0)` / `+ 0`.)
  - float columns (or array<double> elements) containing NaN (HAS_NAN —
    both engines' pandas conversions fold NULL and NaN to NaN, so a
    Spark NaN against an oracle NULL replays MATCH locally while the
    driver's null-bitmap-aware hash diverges.  The oracles emit zero
    NaN; express missing as NULL.)

Findings are a report, not failures: some shapes are legitimately constant
(1-row aggregates, an `exact` flag on a lossless sketch).  Inspect, then
pin real invariants in tests/test_vacuity.py.

Usage:
  python tools/vacuity_audit.py [sf_dir] [entry ...]     # one-SF report
  python tools/vacuity_audit.py --all-sfs                # sweep sf0.001/0.01/0.1,
                                                         # write tools/vacuity_report.json

The q6 class is SF-DEPENDENT (a predicate window can be non-empty at
sf0.1 and empty at sf0.001, or vice versa), so --all-sfs runs the same
gates at every scale the round touches: sf0.001 (entry smoke SF), sf0.01
(driver correctness gate), sf0.1 (bench SF).  The written report is
pinned by tests/test_vacuity.py: every corpus entry must appear in it
(adding an entry without re-running the sweep fails the suite) and no
entry may carry EMPTY_RESULT / ALL_NULL flags outside the documented
allowlist.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re

# Detector-set version, stamped into the committed report and pinned by
# tests/test_vacuity.py: ANY change to the audit's detectors must bump
# this, which forces `--all-sfs` regeneration before the suite goes
# green again (r10 advisor: the committed report silently certified
# invariants against detectors that had known recall holes).
#   v4 (r11): per-occurrence comparison-gate scoping (an expression-side
#       gate no longer vanishes when its literal is also column-scoped),
#       oracle-side -0.0/NaN sweep (ORACLE_NEG_ZERO / ORACLE_HAS_NAN /
#       ORACLE_ERROR flags — the r7-r9 root cause was ORACLE-side -0.0,
#       which the Spark-only sweep could not see).
#   v5 (r11): the oracle sweep reads Arrow, not pandas — `.df()` folds
#       SQL NULL into NaN in float columns, so v4 flagged every
#       legitimately-NULL oracle output (lag/lead boundaries, asof
#       no-match err_value) as ORACLE_HAS_NAN.  Arrow preserves the null
#       bitmap; `to_pylist()` yields None for NULL and float('nan') only
#       for a TRUE NaN, which is the exact distinction the driver's
#       null-bitmap-aware hash makes.
AUDIT_VERSION = 5

# interpolated-percentile call sites in oracle SQL (DuckDB spellings)
_PCTL_RE = re.compile(r"\b(?:QUANTILE_CONT|PERCENTILE_CONT|percentile)\s*\(", re.I)
# non-integer numeric literals in COMPARISON context: these are the
# gates/thresholds whose rounded boundary a result row must not sit on
_CMP_LIT_RE = re.compile(
    r"(?:[<>]=?\s*(-?\d+\.\d+)\b)|(?:\b(-?\d+\.\d+)\s*[<>]=?)"
)


def oracle_static_flags(oracle: str | None) -> list[str]:
    """The r8 `dq_mad_outlier_gate` lesson, generalized statically: an
    oracle CHAINING interpolated percentiles — the alias of one
    percentile referenced inside another percentile's argument — on raw
    doubles is engine-version-fragile (interpolation formula differs by
    1 ulp across engines; a midpoint of two odd-cent values lands on a
    non-representable x.xx5, and the second percentile amplifies it past
    any ROUND).  INDEPENDENT multi-percentile oracles are not flagged:
    with no chaining, a terminal ROUND collapses the 1-ulp engine
    difference unless the exact value sits on the rounding tiebreak,
    which the even-fraction grids (0.2/0.25/0.5 steps) cannot reach.
    The convention that makes chaining safe is the integer grid — both
    percentile arguments wrapped in ROUND(...) (integer-valued doubles
    interpolate exactly); gridded chains are not flagged."""
    if not oracle:
        return []
    calls: list[tuple[str, str | None]] = []  # (arg_text, alias)
    for m in _PCTL_RE.finditer(oracle):
        depth, i = 1, m.end()
        while i < len(oracle) and depth:
            if oracle[i] == "(":
                depth += 1
            elif oracle[i] == ")":
                depth -= 1
            i += 1
        arg = oracle[m.end() : i - 1]
        calls.append((arg, _trailing_alias(oracle[i:])))
    if len(calls) < 2:
        return []
    flags = set()
    for arg, _ in calls:
        for other_arg, alias in calls:
            if (
                alias
                and arg is not other_arg
                and re.search(rf"\b{re.escape(alias)}\b", arg)
                and not (
                    _has_integer_grid_round(arg)
                    and _has_integer_grid_round(other_arg)
                )
            ):
                flags.add(f"CHAINED_PERCENTILES:{alias}")
    return sorted(flags)


_SQL_TYPE_WORDS = {
    "DOUBLE", "FLOAT", "REAL", "BIGINT", "INT", "INTEGER", "SMALLINT",
    "DECIMAL", "NUMERIC", "VARCHAR", "TEXT", "BOOLEAN", "DATE", "TIMESTAMP",
}


def _trailing_alias(tail: str) -> str | None:
    """The output alias of a percentile EXPRESSION, even when the call is
    wrapped (``ROUND(QUANTILE_CONT(x, 0.5), 6) AS med`` — the r8 fragile
    oracle's actual spelling, which an after-the-paren match misses):
    bridge forward over closers/digits/operators only — a letter means a
    NEW expression started, so stop — and skip ``AS <type>`` cast words."""
    pos = 0
    while True:
        m = re.match(r"[\s)\d,.*/+-]{0,40}AS\s+(\w+)", tail[pos:], re.I)
        if not m:
            return None
        if m.group(1).upper() in _SQL_TYPE_WORDS:
            pos += m.end()
            continue
        return m.group(1)


def _has_integer_grid_round(arg: str) -> bool:
    """True iff the percentile argument contains a SINGLE-argument
    ROUND(...) — the integer-grid convention.  Two-argument
    ``ROUND(x, 6)`` rounds to a DECIMAL grid whose interpolated
    midpoints are NOT exactly representable (the x.xx5 trap), so it must
    not exempt a chain."""
    up = arg.upper()
    for m in re.finditer(r"\bROUND\s*\(", up):
        depth, i = 1, m.end()
        top_comma = False
        while i < len(up) and depth:
            c = up[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_comma = True
            i += 1
        if not top_comma:
            return True
    return False


def comparison_literals(oracle: str | None) -> list[float]:
    """Non-integer literals used in a comparison in the oracle SQL —
    the candidate gate values for the boundary-proximity check."""
    return sorted({lit for lit, _ in comparison_gates(oracle)})


# a BARE identifier adjacent to the comparison operator scopes the gate
# to that column (r9 advisor: the unscoped cross-product fires flags on
# unrelated column/literal pairs and inflates the allowlist).  An
# expression side (`ABS(z) > lit`, `a/b < lit`, `x - y > lit`) stays
# unscoped — the gated quantity has no single column name.  Bareness is
# checked by CONTEXT, not just the token (r10 review: the naive regex
# scoped `(a + b) / c < lit` to `c`): the identifier/literal must begin
# and end its expression — bounded by commas, parens, keywords, or the
# string ends — or the gate stays unscoped.
_CMP_SCOPED_L = re.compile(r"([A-Za-z_]\w*)\s*[<>]=?\s*(-?\d+\.\d+)\b")
_CMP_SCOPED_R = re.compile(r"(-?\d+\.\d+)\s*[<>]=?\s*([A-Za-z_]\w*)\b")

_KEYWORDS_BEFORE = {
    "SELECT", "WHERE", "WHEN", "THEN", "ELSE", "AND", "OR", "ON",
    "HAVING", "BY", "CASE", "IF", "NOT",
}
_KEYWORDS_AFTER = {
    "AND", "OR", "THEN", "ELSE", "END", "ASC", "DESC", "IS", "FROM", "AS",
}


def _bare_left(oracle: str, pos: int) -> bool:
    """True when the token starting at ``pos`` BEGINS its expression:
    preceded (ignoring whitespace) by nothing, a comma, an opening
    paren, or a clause keyword — not by an operator, a dot, or a
    closing paren (all of which mean a larger expression's tail)."""
    j = pos - 1
    while j >= 0 and oracle[j].isspace():
        j -= 1
    if j < 0:
        return True
    ch = oracle[j]
    if ch in ",(":
        return True
    if ch.isalnum() or ch == "_":
        k = j
        while k >= 0 and (oracle[k].isalnum() or oracle[k] == "_"):
            k -= 1
        return oracle[k + 1 : j + 1].upper() in _KEYWORDS_BEFORE
    return False


def _bare_right(oracle: str, pos: int) -> bool:
    """True when the token ending at ``pos`` ENDS its expression:
    followed (ignoring whitespace) by nothing, a comma, a closing
    paren, or a clause keyword — not by an operator, a dot, or an
    opening paren (qualified name / function call / arithmetic)."""
    j = pos
    n = len(oracle)
    while j < n and oracle[j].isspace():
        j += 1
    if j >= n:
        return True
    ch = oracle[j]
    if ch in ",)":
        return True
    if ch.isalpha() or ch == "_":
        k = j
        while k < n and (oracle[k].isalnum() or oracle[k] == "_"):
            k += 1
        return oracle[j:k].upper() in _KEYWORDS_AFTER
    return False


def comparison_gates(oracle: str | None) -> list[tuple[float, str | None]]:
    """Comparison gate literals with their scoping column where the SQL
    names one: ``(literal, column | None)`` pairs, deduplicated.  A
    literal OCCURRENCE compared against a bare identifier is scoped to
    that identifier; every occurrence against an expression side emits
    an unscoped entry (checked against every float column, the pre-r10
    behavior) — tracked PER OCCURRENCE, not per literal value, so
    ``SELECT a > 0.5, ABS(b) > 0.5`` keeps the ABS(b) gate's
    all-columns sweep alongside the (0.5, 'a') scope (r10 advisor:
    per-literal tracking dropped it, contradicting the scoping-only-
    narrows contract).  NOTE audit() treats a scoped column that is not
    in the result schema as unscoped — scoping may only ever NARROW a
    check that would still run, never drop it."""
    if not oracle:
        return []
    scoped: dict[float, set[str]] = {}
    scoped_lit_spans: set[tuple[int, int]] = set()
    unscoped: set[float] = set()
    for m in _CMP_SCOPED_L.finditer(oracle):
        if _bare_left(oracle, m.start(1)) and _bare_right(oracle, m.end(2)):
            scoped.setdefault(float(m.group(2)), set()).add(m.group(1))
            scoped_lit_spans.add(m.span(2))
    for m in _CMP_SCOPED_R.finditer(oracle):
        if _bare_left(oracle, m.start(1)) and _bare_right(oracle, m.end(2)):
            scoped.setdefault(float(m.group(1)), set()).add(m.group(2))
            scoped_lit_spans.add(m.span(1))
    for m in _CMP_LIT_RE.finditer(oracle):
        grp = 1 if m.group(1) is not None else 2
        if m.span(grp) not in scoped_lit_spans:
            unscoped.add(float(m.group(grp)))
    gates: list[tuple[float, str | None]] = []
    for lit, cols in scoped.items():
        gates.extend((lit, c) for c in sorted(cols))
    gates.extend((lit, None) for lit in sorted(unscoped))
    return sorted(gates, key=lambda p: (p[0], p[1] or ""))


def _type_has_float(T, dt) -> bool:
    """Does the Spark type contain a float anywhere (scalar, array
    element, struct field, map key/value — recursively)?"""
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _type_has_float(T, dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_type_has_float(T, f.dataType) for f in dt.fields)
    if isinstance(dt, T.MapType):
        return _type_has_float(T, dt.keyType) or _type_has_float(T, dt.valueType)
    return False


def _float_probe(F, T, expr, dt, pred):
    """Column[bool]: does any float value inside ``expr`` (typed ``dt``)
    satisfy ``pred``?  Recurses through arrays (exists), struct fields
    (OR of field probes), and maps (keys + values arrays).  Returns
    None when the type contains no float — no aggregate is built."""
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return pred(expr)
    if isinstance(dt, T.ArrayType):
        if not _type_has_float(T, dt.elementType):
            return None
        return F.exists(
            expr, lambda x: _float_probe(F, T, x, dt.elementType, pred)
        )
    if isinstance(dt, T.StructType):
        subs = [
            _float_probe(F, T, expr[f.name], f.dataType, pred)
            for f in dt.fields
            if _type_has_float(T, f.dataType)
        ]
        if not subs:
            return None
        out = subs[0]
        for s in subs[1:]:
            out = out | s
        return out
    if isinstance(dt, T.MapType):
        subs = []
        if _type_has_float(T, dt.keyType):
            subs.append(
                F.exists(
                    F.map_keys(expr),
                    lambda x: _float_probe(F, T, x, dt.keyType, pred),
                )
            )
        if _type_has_float(T, dt.valueType):
            subs.append(
                F.exists(
                    F.map_values(expr),
                    lambda x: _float_probe(F, T, x, dt.valueType, pred),
                )
            )
        if not subs:
            return None
        out = subs[0]
        for s in subs[1:]:
            out = out | s
        return out
    return None


def _scan_oracle_frame(table) -> list[str]:
    """ORACLE_NEG_ZERO / ORACLE_HAS_NAN flags for a DuckDB oracle result
    as a pyarrow Table.  Arrow, NOT pandas, on purpose: `.df()` folds
    SQL NULL into NaN in float columns, which would flag every
    legitimately-NULL oracle output — `to_pylist()` yields None for
    NULL (skipped; NULL is the CORRECT way to express missing) and a
    float NaN only when the oracle truly computed one.  Recurses
    through lists/tuples/dicts (array<double> and struct outputs)."""
    import math

    flags: list[str] = []

    def scan_value(v, found: list[bool]) -> None:
        if isinstance(v, float):
            if v != v:
                found[0] = True
            elif v == 0.0 and math.copysign(1.0, v) < 0:
                found[1] = True
        elif isinstance(v, (list, tuple)):
            for x in v:
                scan_value(x, found)
        elif isinstance(v, dict):
            for x in v.values():
                scan_value(x, found)

    for name, col in zip(table.column_names, table.columns):
        found = [False, False]
        for v in col.to_pylist():
            scan_value(v, found)
        if found[0]:
            flags.append(f"ORACLE_HAS_NAN:{name}")
        if found[1]:
            flags.append(f"ORACLE_NEG_ZERO:{name}")
    return flags


def audit(sf_dir: str, only: list[str] | None = None, spark=None) -> dict:
    """Run the dynamic sweep at ``sf_dir``.  Pass an existing ``spark``
    session to reuse it (it is NOT stopped — critical for test callers:
    ``getOrCreate()`` hands back any live session, and stopping a
    borrowed one kills every later test sharing the fixture)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_ballista_python_spark.corpus import load_all
    from datafusion_ballista_python_spark.session import ensure_session_confs

    owns_session = spark is None
    if owns_session:
        spark = (
            SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
            .appName("vacuity-audit")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_session_confs(spark)

    registry = load_all()
    names = [n for n in registry if only is None or n in only]
    # Oracle-side -0.0/NaN sweep (r10 advisor): the r7-r9 red streak's
    # actual root cause was ORACLE-side -0.0 (DuckDB ROUND preserving
    # the sign bit) while Spark emitted +0.0 — a shape a Spark-only
    # sweep cannot flag.  Run each entry's DuckDB oracle at the same
    # sf_dir and scan the pandas frame (floats recursively, through
    # lists/arrays) for -0.0 and NaN.
    try:
        from tests.oracle_harness import duckdb_con

        dcon = duckdb_con(sf_dir)
    except Exception:
        dcon = None
    report: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        entry: dict = {"rows": None, "flags": []}
        entry["flags"] += oracle_static_flags(getattr(spec, "oracle", None))
        gate_pairs = comparison_gates(getattr(spec, "oracle", None))
        try:
            df = spec.fn(spark, sf_dir)
            # a gate scoped to a column ABSENT from the result's float
            # columns falls back to the all-columns sweep (r10 review:
            # scoping must only ever NARROW a check, never drop it —
            # CTE-internal and WHERE-filter column names land here)
            float_cols = {
                f.name.lower()
                for f in df.schema.fields
                if isinstance(f.dataType, (T.DoubleType, T.FloatType))
            }
            eff_pairs = [
                (lit, s if (s is not None and s.lower() in float_cols) else None)
                for lit, s in gate_pairs
            ]
            # one aggregate pass computes rowcount + per-column degeneracy
            aggs = [F.count(F.lit(1)).alias("__n")]
            for f in df.schema.fields:
                c = F.col(f.name)
                aggs.append(F.count(c).alias(f"nn::{f.name}"))
                if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                    # boundary proximity: min distance of the column (and
                    # its |abs|, for |z|-style gates) to each comparison
                    # literal in the oracle — a row AT a gate value flips
                    # across engines on any 1-ulp upstream divergence.
                    # A gate the oracle scopes to a named column is only
                    # checked against that column (r9 advisor fix).
                    for i, (lit, scol) in enumerate(eff_pairs):
                        if scol is not None and scol.lower() != f.name.lower():
                            continue
                        aggs.append(
                            F.min(
                                F.least(
                                    F.abs(c - F.lit(lit)),
                                    F.abs(F.abs(c) - F.lit(lit)),
                                )
                            ).alias(f"ke::{f.name}::{i}")
                        )
                # signed-zero + NaN detectors, RECURSIVE over the type
                # (scalar float, array<...>, struct fields, map keys and
                # values — r10 review: top-level-only probes left structs
                # and nested arrays unswept while test_vacuity claims a
                # corpus-WIDE invariant).  NEG_ZERO (r9 verdict task #3):
                # -0.0 is the class == is blind to; the string cast
                # preserves the sign bit and survives ANSI.  HAS_NAN
                # (r10): pandas folds NULL and NaN to the same NaN on
                # both engines' conversion paths, so a Spark NaN vs
                # oracle NULL replays MATCH locally while a null-bitmap-
                # aware hash diverges; the oracles emit zero NaN, so any
                # Spark-side NaN is a red flag.
                for kind, pred in (
                    ("nz", lambda e: e.cast("string") == "-0.0"),
                    ("nan", F.isnan),
                ):
                    probe = _float_probe(F, T, c, f.dataType, pred)
                    if probe is not None:
                        aggs.append(
                            F.sum(
                                F.when(probe, 1).otherwise(0)
                            ).alias(f"{kind}::{f.name}")
                        )
                if isinstance(f.dataType, T.BooleanType):
                    aggs.append(
                        F.count_distinct(c).alias(f"bd::{f.name}")
                    )
                elif isinstance(f.dataType, T.StringType):
                    aggs.append(
                        F.max(F.length(c)).alias(f"sl::{f.name}")
                    )
                elif isinstance(
                    f.dataType,
                    (T.LongType, T.IntegerType, T.DoubleType, T.FloatType,
                     T.DecimalType, T.ShortType),
                ):
                    aggs.append(F.count_distinct(c).alias(f"nd::{f.name}"))
                    aggs.append(F.max(F.abs(c)).alias(f"mx::{f.name}"))
            row = df.agg(*aggs).collect()[0].asDict()
            n = row["__n"]
            entry["rows"] = n
            if n == 0:
                entry["flags"].append("EMPTY_RESULT")
            else:
                for k, v in row.items():
                    if "::" not in k:
                        continue
                    kind, col = k.split("::", 1)
                    if kind == "ke":
                        col, idx = col.rsplit("::", 1)
                        lit = eff_pairs[int(idx)][0]
                        tol = max(1e-12, abs(lit) * 1e-9)
                        if v is not None and v < tol:
                            entry["flags"].append(
                                f"KNIFE_EDGE:{col}@{lit}"
                            )
                        continue
                    if kind == "nz":
                        if v:
                            entry["flags"].append(f"NEG_ZERO:{col}")
                        continue
                    if kind == "nan":
                        if v:
                            entry["flags"].append(f"HAS_NAN:{col}")
                        continue
                    if kind == "nn" and v == 0:
                        entry["flags"].append(f"ALL_NULL:{col}")
                    elif kind == "bd" and row[f"nn::{col}"] > 1 and v <= 1:
                        entry["flags"].append(f"CONST_BOOL:{col}")
                    elif kind == "sl" and v == 0:
                        entry["flags"].append(f"ALL_EMPTY_STR:{col}")
                    elif (
                        kind == "nd"
                        and n > 1
                        and row[f"nn::{col}"] > 1
                        and v <= 1
                        and (row.get(f"mx::{col}") or 0) == 0
                    ):
                        entry["flags"].append(f"CONST_ZERO:{col}")
        except Exception as e:  # noqa: BLE001 - report, don't die
            entry["flags"].append(f"ERROR:{type(e).__name__}:{e}")
        oracle = getattr(spec, "oracle", None)
        if oracle and dcon is not None:
            try:
                entry["flags"] += _scan_oracle_frame(dcon.sql(oracle).arrow())
            except Exception as e:  # noqa: BLE001 - report, don't die
                entry["flags"].append(f"ORACLE_ERROR:{type(e).__name__}:{e}")
        report[name] = entry
    if owns_session:
        spark.stop()
    return report


ALL_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPORT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vacuity_report.json")


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--all-sfs":
        full = {"_audit_version": AUDIT_VERSION}
        for sf_dir in ALL_SFS:
            key = os.path.basename(sf_dir.rstrip("/"))
            full[key] = audit(sf_dir, args[1:] or None)
        with open(REPORT_PATH, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
            fh.write("\n")
        flagged = {
            sf: {k: v["flags"] for k, v in rep.items() if v["flags"]}
            for sf, rep in full.items()
            if not sf.startswith("_")
        }
        print(json.dumps({"report": REPORT_PATH,
                          "n_flagged": {sf: len(f) for sf, f in flagged.items()},
                          "flagged": flagged}, indent=1))
        return
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], args[1:]
    elif args and ("/" in args[0] or os.sep in args[0]):
        # path-shaped but not a directory: fail loudly instead of silently
        # reinterpreting the typo as an entry-name filter that matches
        # nothing and printing a clean empty report
        raise SystemExit(f"ERROR: {args[0]!r} is not a directory")
    else:
        sf_dir, only = "/root/testdata/sf0.01", args
    report = audit(sf_dir, only or None)
    flagged = {k: v for k, v in report.items() if v["flags"]}
    print(json.dumps({"sf_dir": sf_dir, "n_entries": len(report),
                      "n_flagged": len(flagged), "flagged": flagged}, indent=1))


if __name__ == "__main__":
    main()
