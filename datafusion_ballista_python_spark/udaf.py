"""Aggregate Python UDFs: the Accumulator protocol executed distributed.

Reference surface (``src/udaf.rs:34-146``, ``ballista/__init__.py:98-115``):
``udaf(accum_class, input_type, return_type, state_type, volatility, name)``
where ``accum_class()`` instances implement state/update/merge/evaluate.

Distributed execution (SURVEY §7 known-hard #1) is a real two-phase
aggregation — the same shape Spark uses for built-in aggregates:

  phase 1 (map-side partial, no shuffle): ``mapInPandas`` folds each
      partition's batches into one accumulator per group key and emits
      rows of [group keys..., state fields..., validity flags...] — the
      explicit per-state validity bit keeps null state distinguishable
      from a genuine NaN float state across the pandas shuffle; the
      live-accumulator dict is flushed every ``PARTIAL_FLUSH_KEYS``
      distinct keys so memory is bounded regardless of per-partition
      group cardinality;
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

    # FLOAT/DOUBLE group keys cross the pandas boundary as strings: pandas
    # represents a NULL float key as NaN, so a genuine NaN key and a NULL
    # key would merge into ONE group (Spark/DataFusion keep them distinct).
    # Java Double.toString is shortest-round-trip, and the string->double
    # cast at the end restores the exact value ('NaN' -> NaN, NULL -> NULL).
    float_keys = [
        k
        for k in key_names
        if isinstance(base.schema[k].dataType, (T.FloatType, T.DoubleType))
    ]
    orig_key_types = {k: base.schema[k].dataType for k in float_keys}
    if float_keys:
        # normalize -0.0 to 0.0 BEFORE the string cast: '-0.0' and '0.0'
        # would string-group separately, but Spark/DataFusion grouping
        # treats them as one key (IEEE -0.0 == 0.0)
        def _norm(c: str):
            dt = orig_key_types[c]
            return (
                F.when(F.col(c) == 0, F.lit(0.0).cast(dt))
                .otherwise(F.col(c))
                .cast("string")
                .alias(c)
            )

        base = base.select(
            *[_norm(c) if c in float_keys else F.col(c) for c in base.columns]
        )
    key_schema = [base.schema[k] for k in key_names]

    # ---- phase 1: map-side partial accumulation --------------------------
    # each state field travels with an explicit boolean validity flag:
    # pandas represents null as NaN/NaT, so without the flag a genuinely
    # NaN float state and a null state are indistinguishable after the
    # shuffle (and integer nulls would not round-trip at all)
    state_fields: list[T.StructField] = []
    validity_fields: list[T.StructField] = []
    for ui, u in enumerate(udafs):
        for si, st in enumerate(u.factory.state_type):
            state_fields.append(
                T.StructField(f"__st_{ui}_{si}", arrow_to_spark(st), True)
            )
            validity_fields.append(
                T.StructField(f"__stv_{ui}_{si}", T.BooleanType(), False)
            )
    partial_schema = T.StructType(list(key_schema) + state_fields + validity_fields)
    factories = [u.factory for u in udafs]

    cols = key_names + [f.name for f in state_fields] + [f.name for f in validity_fields]

    def drain(accs):
        """Turn the accumulator dict into partial-state rows and clear it."""
        import pandas as pd

        rows = []
        for key, accum_list in accs.items():
            row = list(key)
            valid = []
            for acc in accum_list:
                for s in acc.state():
                    row.append(s.as_py())
                    valid.append(bool(s.is_valid))
            rows.append(row + valid)
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

    def rebuild_state(vals, valids, st) -> pa.Array:
        """Reconstruct a state array from pandas-round-tripped values plus
        the explicit validity flags: validity False -> null regardless of
        the placeholder pandas used (NaN/NaT/None); validity True with a
        NaN/None value -> the state really was NaN (float types keep it);
        integer values promoted to float by a nullable pandas column are
        narrowed back."""
        out = []
        integer = pa.types.is_integer(st)
        floating = pa.types.is_floating(st)
        for v, ok in zip(vals, valids):
            if not ok:
                out.append(None)
                continue
            if v is None and floating:
                # Spark's pandas->Arrow boundary already collapsed the NaN
                # to null inside phase 1's output; validity says the state
                # was real, so for float types it can only have been NaN
                out.append(float("nan"))
                continue
            if isinstance(v, float):
                if v != v:  # genuine NaN state, preserved
                    out.append(float("nan"))
                    continue
                if integer:
                    v = int(v)
            out.append(v)
        # from_pandas=False: nulls are already explicit Nones here, and
        # from_pandas=True would collapse the just-restored NaNs back to
        # null — the exact corruption this function exists to prevent
        return pa.array(out, type=st, from_pandas=False)

    def merge_eval(raw_key, buffers, vbuffers):
        row = list(raw_key)
        for ui, fac in enumerate(factories):
            acc = fac.accum()
            states = [
                rebuild_state(buffers[ui][si], vbuffers[ui][si], st)
                for si, st in enumerate(fac.state_type)
            ]
            acc.merge(states)
            row.append(acc.evaluate().as_py())
        return row

    # phase 2 runs on ARROW batches (mapInArrow), not pandas: the pandas
    # bridge conflates NaN with null in float columns, so a NaN produced
    # by evaluate() (or carried in a state) would silently become null in
    # the emitted result; Arrow batches round-trip both faithfully
    def _out_schema() -> pa.Schema:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(result_fields)

    def emit_batch(rows: list, schema: pa.Schema) -> pa.RecordBatch:
        cols_data = list(zip(*rows)) if rows else [[] for _ in schema]
        arrays = [
            pa.array(list(vals), type=f.type, from_pandas=False)
            for vals, f in zip(cols_data, schema)
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=schema)

    def norm(k):
        # NaN != NaN would split a float-NaN-keyed group at a batch
        # boundary (Arrow to_pylist yields proper None for nulls, so only
        # float NaN needs canonicalizing)
        return tuple(
            ("__nan__",) if isinstance(x, float) and x != x else x for x in k
        )

    def final_stream(batches):
        schema = _out_schema()
        cur_norm = cur_raw = cur_buf = cur_vbuf = None
        pending: list = []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            key_lists = [rb.column(k).to_pylist() for k in key_names]
            st_lists = {
                (ui, si): rb.column(f"__st_{ui}_{si}").to_pylist()
                for ui, fac in enumerate(factories)
                for si in range(len(fac.state_type))
            }
            v_lists = {
                (ui, si): rb.column(f"__stv_{ui}_{si}").to_pylist()
                for ui, fac in enumerate(factories)
                for si in range(len(fac.state_type))
            }
            for i in range(rb.num_rows):
                key = tuple(kl[i] for kl in key_lists)
                nk = norm(key)
                if cur_norm is not None and nk != cur_norm:
                    pending.append(merge_eval(cur_raw, cur_buf, cur_vbuf))
                    cur_norm = None
                if cur_norm is None:
                    cur_norm, cur_raw = nk, key
                    cur_buf = [[[] for _ in fac.state_type] for fac in factories]
                    cur_vbuf = [[[] for _ in fac.state_type] for fac in factories]
                for ui, fac in enumerate(factories):
                    for si in range(len(fac.state_type)):
                        cur_buf[ui][si].append(st_lists[(ui, si)][i])
                        cur_vbuf[ui][si].append(v_lists[(ui, si)][i])
            if len(pending) >= 4096:
                yield emit_batch(pending, schema)
                pending = []
        if cur_norm is not None:
            pending.append(merge_eval(cur_raw, cur_buf, cur_vbuf))
        if pending:
            yield emit_batch(pending, schema)

    def final_global(batches):
        schema = _out_schema()
        buffers = [[[] for _ in fac.state_type] for fac in factories]
        vbuffers = [[[] for _ in fac.state_type] for fac in factories]
        for rb in batches:
            for ui, fac in enumerate(factories):
                for si in range(len(fac.state_type)):
                    buffers[ui][si].extend(rb.column(f"__st_{ui}_{si}").to_pylist())
                    vbuffers[ui][si].extend(rb.column(f"__stv_{ui}_{si}").to_pylist())
        yield emit_batch([merge_eval([], buffers, vbuffers)], schema)

    if n_keys:
        finals = (
            partials.repartition(*key_names)
            .sortWithinPartitions(*key_names)
            .mapInArrow(final_stream, schema=result_fields)
        )
    else:
        # repartition(1) (a shuffle), NOT coalesce(1): coalesce collapses the
        # upstream mapInPandas(partial) stage into one task, serializing
        # phase 1; the shuffle boundary keeps partial accumulation parallel
        finals = partials.repartition(1).mapInArrow(final_global, schema=result_fields)

    # ---- optional plain aggregates over the same grouping ----------------
    if plain_aggs:
        plain_cols = [to_column(a) for a in plain_aggs]
        if n_keys:
            # group the plain side on the SAME (possibly string-encoded)
            # keys as the UDAF side so NaN groups line up, and join
            # NULL-SAFELY: the old null-unsafe equi-join silently dropped
            # every NULL-keyed group from the combined result
            plain_df = df.groupBy(
                *[
                    (g.cast("string") if k in float_keys else g).alias(k)
                    for g, k in zip(group_cols, key_names)
                ]
            ).agg(*plain_cols)
            for k in key_names:
                plain_df = plain_df.withColumnRenamed(k, f"__pl_{k}")
            cond = None
            for k in key_names:
                c = F.col(k).eqNullSafe(F.col(f"__pl_{k}"))
                cond = c if cond is None else (cond & c)
            finals = finals.join(plain_df, on=cond, how="inner").drop(
                *[f"__pl_{k}" for k in key_names]
            )
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
    # decode string-encoded float keys back to their original type
    # ('NaN' -> NaN, NULL -> NULL, values exact — shortest-round-trip)
    for k in float_keys:
        out_name = renames.get(k, k)
        finals = finals.withColumn(
            out_name, F.col(out_name).cast(orig_key_types[k])
        )
    return finals
