"""Binned range (interval) join — joining on an inequality/containment
predicate without the BroadcastNestedLoopJoin trap.

A naive ``a.ts BETWEEN b.start AND b.end`` join has no equi-key, so Spark
falls back to a nested loop — O(|A|·|B|) comparisons, unusable at scale.
The standard fix: quantize time into fixed-width bins, explode each right
interval over the bins it overlaps, equi-join on the bin id, then apply
the exact predicate.  Cost: one hash shuffle on bin ids + |interval|/bin
duplication of the right side; comparisons drop from |A|·|B| to pairs
sharing a bin.

Bin width tuning: ≈ median interval length; too small multiplies the
right side, too large multiplies candidate pairs per bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (half-open), on epoch-scaled numeric/timestamp
    columns; ``bin_width`` in the same units (seconds for timestamps).

    Both sides are binned JVM-side; the only shuffle is the bin equi-join.

    Only ``how="inner"`` is supported: the exact range predicate must run
    as a post-join filter, which would silently drop the null-padded rows
    any outer join emits (degrading every outer ``how`` to inner — the
    bug this guard replaced), and outer intervals would additionally
    surface once per exploded bin.  For left-outer point retention,
    compose: inner range_join + a left_anti on your point key, unioned
    back null-padded.
    """
    if how != "inner":
        from ..errors import BallistaError

        raise BallistaError(
            f"range_join supports how='inner' only (got {how!r}): the exact "
            "range predicate is a post-join filter that would drop outer "
            "null-padded rows. Compose inner + left_anti on your point key "
            "for left-outer semantics."
        )
    p_sec = F.col(point_col).cast("double")
    s_sec = F.col(start_col).cast("double")
    e_sec = F.col(end_col).cast("double")
    if dict(points.dtypes)[point_col].startswith("timestamp"):
        p_sec = F.unix_micros(F.col(point_col).cast("timestamp")) / 1e6
        s_sec = F.unix_micros(F.col(start_col).cast("timestamp")) / 1e6
        e_sec = F.unix_micros(F.col(end_col).cast("timestamp")) / 1e6

    p = points.withColumn("__bin", F.floor(p_sec / bin_width).cast("long"))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(s_sec / bin_width).cast("long"),
                F.floor(e_sec / bin_width).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on="__bin", how=how).where(
        (F.col(start_col) <= F.col(point_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bin")
