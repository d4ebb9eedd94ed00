"""Aggregate Python UDFs: the Accumulator protocol executed distributed.

Reference surface (``src/udaf.rs:34-146``, ``ballista/__init__.py:98-115``):
``udaf(accum_class, input_type, return_type, state_type, volatility, name)``
where ``accum_class()`` instances implement state/update/merge/evaluate.

Distributed execution (SURVEY §7 known-hard #1) is a real two-phase
aggregation — the same shape Spark uses for built-in aggregates:

  phase 1 (map-side partial, no shuffle): ``mapInPandas`` folds each
      partition's batches into one accumulator per group key and emits
      rows of [group keys..., state fields...]; the live-accumulator dict
      is flushed every ``PARTIAL_FLUSH_KEYS`` distinct keys so memory is
      bounded regardless of per-partition group cardinality;
  phase 2 (final, one shuffle on the group keys): ``applyInPandas`` per
      key calls ``merge`` over the collected partial states, then
      ``evaluate``.

Only partial states cross the shuffle — bytes proportional to
(#groups x #partitions), not to input rows, so the operator scales like a
native hash aggregate.  The reference never achieved distributed UDAF
execution (python.md:137-138); this does.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .datatypes import arrow_to_spark
from .errors import BallistaError
from .expression import to_column

# Phase-1 flush threshold: cap on live Python accumulators per task.  With
# the default 64k keys and small fixed-size states the dict stays ~tens of
# MB even at 10^8 distinct keys per partition; extra partial rows per key
# only add shuffle bytes, which phase-2 merge absorbs.
PARTIAL_FLUSH_KEYS = 65536


class UdafFactory:
    """Result of :func:`udaf`; call with an input expression inside
    ``DataFrame.aggregate``: ``df.aggregate([...], [my_udaf(col('x'))])``."""

    def __init__(
        self,
        accum: Callable,
        input_type: pa.DataType,
        return_type: pa.DataType,
        state_type: List[pa.DataType],
        volatility: str = "immutable",
        name: Optional[str] = None,
    ):
        self.accum = accum
        self.input_type = input_type
        self.return_type = return_type
        self.state_type = list(state_type)
        self.volatility = volatility
        self.name = name or getattr(accum, "__name__", "udaf").lower()

    def __call__(self, expr) -> "Udaf":
        return Udaf(self, to_column(expr))


class Udaf:
    """A UDAF bound to its input expression, with an output alias."""

    def __init__(self, factory: UdafFactory, input_col: Column, out_name: Optional[str] = None):
        self.factory = factory
        self.input_col = input_col
        self.out_name = out_name or factory.name

    def alias(self, name: str) -> "Udaf":
        return Udaf(self.factory, self.input_col, name)


def udaf(
    accum: Callable,
    input_type: pa.DataType,
    return_type: pa.DataType,
    state_type: List[pa.DataType],
    volatility: str = "immutable",
    name: Optional[str] = None,
) -> UdafFactory:
    """Create an aggregate UDF (reference ``ballista/__init__.py:98-115``)."""
    return UdafFactory(accum, input_type, return_type, state_type, volatility, name)


def apply_udafs(
    df: SparkDataFrame,
    group_cols: List[Column],
    plain_aggs: List,
    udafs: List[Udaf],
) -> SparkDataFrame:
    """Execute UDAF aggregation (two-phase), optionally joined with plain
    Catalyst aggregates computed over the same grouping."""
    n_keys = len(group_cols)
    key_names = [f"__gk{i}" for i in range(n_keys)]

    # project group keys + one input column per udaf
    in_names = [f"__in{i}" for i in range(len(udafs))]
    proj = [g.alias(k) for g, k in zip(group_cols, key_names)] + [
        u.input_col.alias(n) for u, n in zip(udafs, in_names)
    ]
    base = df.select(*proj)
    key_schema = [base.schema[k] for k in key_names]

    # ---- phase 1: map-side partial accumulation --------------------------
    state_fields: list[T.StructField] = []
    for ui, u in enumerate(udafs):
        for si, st in enumerate(u.factory.state_type):
            state_fields.append(
                T.StructField(f"__st_{ui}_{si}", arrow_to_spark(st), True)
            )
    partial_schema = T.StructType(list(key_schema) + state_fields)
    factories = [u.factory for u in udafs]

    cols = key_names + [f.name for f in state_fields]

    def drain(accs):
        """Turn the accumulator dict into partial-state rows and clear it."""
        import pandas as pd

        rows = []
        for key, accum_list in accs.items():
            row = list(key)
            for acc in accum_list:
                row.extend(s.as_py() for s in acc.state())
            rows.append(row)
        accs.clear()
        return pd.DataFrame(rows, columns=cols)

    def partial(batches):
        # Memory bound: the dict holds at most PARTIAL_FLUSH_KEYS live
        # accumulators; past that the partial states are emitted early and
        # the dict reset (a native hash agg's spill).  A key seen again
        # after a flush just produces another partial row — phase 2's
        # merge already folds any number of partials per key.
        accs: dict[tuple, list] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            grouped = pdf.groupby(key_names, dropna=False, sort=False) if n_keys else [((), pdf)]
            for key, g in grouped:
                if n_keys and not isinstance(key, tuple):
                    key = (key,)
                accs_for_key = accs.setdefault(key, [f.accum() for f in factories])
                for ui, fac in enumerate(factories):
                    arr = pa.Array.from_pandas(g[in_names[ui]], type=fac.input_type)
                    accs_for_key[ui].update(arr)
            if len(accs) >= PARTIAL_FLUSH_KEYS:
                yield drain(accs)
        if accs:
            yield drain(accs)

    partials = base.mapInPandas(partial, schema=partial_schema)

    # ---- phase 2: shuffle on keys, merge + evaluate ----------------------
    # Sort-based streaming merge, not groupBy().applyInPandas: that API
    # makes one Python call (and one pandas frame) PER GROUP, which at 10^5+
    # groups dominates wall time.  Hash-repartition on the keys co-locates
    # each key's partials, sortWithinPartitions makes them contiguous, and
    # mapInPandas streams group boundaries — O(arrow batches) Python calls
    # and memory bounded by one batch + the current group's state rows.
    result_fields = T.StructType(
        list(key_schema)
        + [T.StructField(u.out_name, arrow_to_spark(u.factory.return_type), True) for u in udafs]
    )
    out_cols = [f.name for f in result_fields.fields]

    def merge_eval(raw_key, buffers):
        row = list(raw_key)
        for ui, fac in enumerate(factories):
            acc = fac.accum()
            # from_pandas=True: buffer values come off pandas columns where
            # null states round-trip as NaN/NaT; without it integer state
            # types raise ArrowInvalid and float states receive NaN instead
            # of null, corrupting accumulators whose state can be None.
            # KNOWN LIMIT: a float state that legitimately holds NaN is
            # indistinguishable from null after the pandas shuffle and
            # arrives as None in merge(); accumulators for which NaN is a
            # meaningful state value should encode it explicitly (e.g. a
            # separate boolean state field) rather than rely on NaN
            states = [
                pa.array(buffers[ui][si], type=st, from_pandas=True)
                for si, st in enumerate(fac.state_type)
            ]
            acc.merge(states)
            row.append(acc.evaluate().as_py())
        return row

    def final_stream(batches):
        import pandas as pd

        def norm(k):
            # NaN != NaN (and NaT != NaT) would split a null-keyed group at
            # a batch boundary; pd.isna covers NaN, NaT and pd.NA alike
            out = []
            for x in k:
                try:
                    is_null = bool(pd.isna(x))
                except (TypeError, ValueError):
                    is_null = False
                out.append(None if is_null else x)
            return tuple(out)

        cur_norm = cur_raw = cur_buf = None
        pending: list = []
        for pdf in batches:
            if pdf.empty:
                continue
            # rows arrive sorted by key, so sort=False iterates contiguous runs
            for key, g in pdf.groupby(key_names, dropna=False, sort=False):
                if not isinstance(key, tuple):
                    key = (key,)
                nk = norm(key)
                if cur_norm is not None and nk != cur_norm:
                    pending.append(merge_eval(cur_raw, cur_buf))
                    cur_norm = None
                if cur_norm is None:
                    cur_norm, cur_raw = nk, key
                    cur_buf = [[[] for _ in fac.state_type] for fac in factories]
                for ui, fac in enumerate(factories):
                    for si in range(len(fac.state_type)):
                        cur_buf[ui][si].extend(g[f"__st_{ui}_{si}"].tolist())
            if len(pending) >= 4096:
                yield pd.DataFrame(pending, columns=out_cols)
                pending = []
        if cur_norm is not None:
            pending.append(merge_eval(cur_raw, cur_buf))
        if pending:
            yield pd.DataFrame(pending, columns=out_cols)

    def final_global(batches):
        import pandas as pd

        buffers = [[[] for _ in fac.state_type] for fac in factories]
        for pdf in batches:
            for ui, fac in enumerate(factories):
                for si in range(len(fac.state_type)):
                    buffers[ui][si].extend(pdf[f"__st_{ui}_{si}"].tolist())
        yield pd.DataFrame([merge_eval([], buffers)], columns=out_cols)

    if n_keys:
        finals = (
            partials.repartition(*key_names)
            .sortWithinPartitions(*key_names)
            .mapInPandas(final_stream, schema=result_fields)
        )
    else:
        # repartition(1) (a shuffle), NOT coalesce(1): coalesce collapses the
        # upstream mapInPandas(partial) stage into one task, serializing
        # phase 1; the shuffle boundary keeps partial accumulation parallel
        finals = partials.repartition(1).mapInPandas(final_global, schema=result_fields)

    # ---- optional plain aggregates over the same grouping ----------------
    if plain_aggs:
        plain_cols = [to_column(a) for a in plain_aggs]
        if n_keys:
            plain_df = df.groupBy(
                *[g.alias(k) for g, k in zip(group_cols, key_names)]
            ).agg(*plain_cols)
            finals = finals.join(plain_df, on=key_names, how="inner")
        else:
            finals = finals.crossJoin(df.agg(*plain_cols))

    # surface group keys under their original names where derivable
    renames = {}
    for i, g in enumerate(group_cols):
        try:
            orig = df.select(g).schema.fields[0].name
            renames[key_names[i]] = orig
        except Exception:
            pass
    for old, new in renames.items():
        finals = finals.withColumnRenamed(old, new)
    return finals
