"""As-of (point-in-time) join — an operator Spark lacks natively, built as
a composition of DataFrame ops (no UDF, no driver loop).

``asof_join(left, right)`` attaches to each left row the most recent right
row with ``right.ts <= left.ts`` within the same key group — the standard
feature/point-in-time lookup of event pipelines (quote-at-trade-time,
model-version-at-event-time, ...).  ``direction`` extends the match rule
to the full pandas ``merge_asof`` contract: ``"backward"`` (default),
``"forward"`` (earliest right row at-or-after), and ``"nearest"``
(whichever side is closer in time; ties -> backward).

Implementation (the scalable union trick, not a range join):
1. tag both sides and union them on (key, ts) — one dataset, one schema;
2. one shuffle on the key, sort by (ts, side) within partitions;
3. carry the matched right row as ONE struct via
   ``last_value(struct, ignoreNulls)`` over an unbounded-preceding window
   (``first_value`` over the mirrored unbounded-FOLLOWING frame for the
   forward direction; nearest runs both passes over the SAME sorted
   frame and picks per row — still one exchange).  Carrying the whole
   struct — not per-column ignoreNulls — is what gives MATCHED-ROW
   semantics: a NULL field on the matched right row surfaces as NULL
   instead of being silently replaced by an older non-null value;
4. keep left rows.

NULL contract (pandas/SQL-ASOF parity): right rows with a NULL ``on``
value never match; left rows with a NULL ``on`` value match nothing.

Cost: ONE exchange of |left| + |right| rows and a per-key sort — no
quadratic range join, no broadcast requirement, skew only if a single key
dominates both sides (then salt the key upstream).  A SortMergeJoin-based
range join would re-scan right rows per left row; this is strictly linear
in the union size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
    direction: str = "backward",
    tolerance: "Column | object | None" = None,
) -> DataFrame:
    """For each left row, the matching right row grouped by ``by`` keys:

    - ``direction="backward"``: latest right row with ``right.on <=
      left.on`` (``<`` when strict) — the point-in-time default;
    - ``direction="forward"``: earliest right row with ``right.on >=
      left.on`` (``>`` when strict) — next-event lookup;
    - ``direction="nearest"``: whichever of the two is closer in ``on``
      (ties prefer backward; ``strict`` excludes equal-time matches from
      BOTH sides).  Requires a numeric or timestamp ``on`` column (the
      distance comparison needs subtraction; backward/forward work on
      any orderable type).

    right_cols: value columns carried from the right side (default: all
    non-key, non-time columns), each suffixed to avoid collisions.  The
    carried values are the MATCHED row's values — a NULL field on the
    matched row stays NULL.  Left rows with no qualifying right row get
    NULLs (left-outer semantics); right rows with NULL ``on`` never
    match and left rows with NULL ``on`` match nothing.  If several
    right rows share the same (key, on) value the matched one among them
    is unspecified — dedup upstream when that matters.

    tolerance: pandas ``merge_asof(tolerance=...)`` parity — an upper
    bound on the |on distance| to the matched row; a match farther away
    is discarded (the left row keeps NULLs, it is never dropped).  Pass
    a number for numeric ``on``; an interval Column (e.g.
    ``F.expr("INTERVAL 30 MINUTES")``) for timestamp ``on``.  Applied as
    a post-match predicate on the carried struct, so it adds ZERO
    exchanges — the window plan is unchanged.  A non-positive numeric
    tolerance raises (pandas ``merge_asof`` parity: it raises
    ``ValueError("tolerance must be positive")``) — silently it would
    degrade every match to NULL.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"unknown direction {direction!r}: expected 'backward', "
            "'forward' or 'nearest'"
        )
    on_type = left.schema[on].dataType
    if direction == "nearest" and not isinstance(
        on_type, (T.NumericType, T.TimestampType, T.TimestampNTZType)
    ):
        raise ValueError(
            f"direction='nearest' needs a numeric or timestamp on-column "
            f"for the distance comparison; {on!r} is {on_type.simpleString()}"
        )
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    out_names = [f"{c}{suffix}" for c in right_cols]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n)
          for c, n in zip(right_cols, out_names)],
    )
    r_tag = right.where(F.col(on).isNotNull()).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(by) | {on}],
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    ).select(*l_tag.columns)  # align column order

    carried = l_tag.unionByName(r_tag)
    # the WHOLE candidate right row travels as one struct: ignoreNulls then
    # skips left rows (struct is NULL there) but never a matched row's own
    # NULL field — matched-row semantics for every direction
    carried = carried.withColumn(
        "__m",
        F.when(
            F.col("__side") == 0,
            F.struct(F.col(on).alias("__on"),
                     *[F.col(n) for n in out_names]),
        ),
    )

    # tie handling at equal `on`: the right row must sort INSIDE the left
    # row's frame for inclusive semantics and OUTSIDE it for strict.
    # backward frame = [preceding, current] (right first at ties => "<=");
    # forward frame = [current, following] (right after left => ">=")
    back_side = F.col("__side").asc() if not strict else F.col("__side").desc()
    fwd_side = F.col("__side").desc() if not strict else F.col("__side").asc()
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), back_side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), fwd_side)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    if direction == "backward":
        match = F.last("__m", ignorenulls=True).over(wb)
    elif direction == "forward":
        match = F.first("__m", ignorenulls=True).over(wf)
    else:  # nearest: both passes over the one sorted frame, pick per row.
        # ties prefer backward: forward wins only STRICTLY closer.  The
        # distances compare as raw differences (DayTimeInterval for
        # timestamp/timestamp_ntz `on`, numeric otherwise — the ctor
        # validated the type)
        bm = F.last("__m", ignorenulls=True).over(wb)
        fm = F.first("__m", ignorenulls=True).over(wf)
        use_fwd = F.when(bm.isNull(), fm.isNotNull()).otherwise(
            fm.isNotNull()
            & ((fm["__on"] - F.col(on)) < (F.col(on) - bm["__on"]))
        )
        match = F.when(use_fwd, fm).otherwise(bm)
    if tolerance is not None:
        # pandas merge_asof parity: reject a non-positive literal tolerance
        # up front instead of silently NULLing every match (interval
        # Columns are opaque expressions — those are the caller's contract)
        if not isinstance(tolerance, Column):
            try:
                bad = float(tolerance) <= 0
            except (TypeError, ValueError):
                bad = False
            if bad:
                from ..errors import BallistaError

                raise BallistaError(
                    f"tolerance must be positive, got {tolerance!r}"
                )
        # direction-agnostic |distance| via a side test (abs() is not
        # defined on DayTimeInterval): NULL match -> NULL dist -> NULL
        # condition -> match stays NULL, as required
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        dist = F.when(
            match["__on"] <= F.col(on), F.col(on) - match["__on"]
        ).otherwise(match["__on"] - F.col(on))
        match = F.when(dist <= tol, match)
    # left rows with NULL `on` match nothing (the forward frame would
    # otherwise see every row; NULLS FIRST ordering shields only backward)
    match = F.when(F.col(on).isNotNull(), match)
    carried = carried.withColumn("__match", match)
    for n in out_names:
        carried = carried.withColumn(n, F.col("__match")[n])
    return (
        carried.where(F.col("__side") == 1)
        .drop("__side", "__m", "__match")
    )
