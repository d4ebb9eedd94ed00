"""Expression: the engine's column-expression tree, wrapping pyspark Column.

Parity surface per reference ``src/expression.rs``:
- comparison operators  (``__richcmp__``, expression.rs:48-58)
- arithmetic ``+ - * / %``  (expression.rs:64-82)
- boolean ``& | ~``  (expression.rs:84-94)
- ``expr['key']`` struct-field / map-key / list-index access (expression.rs:96-102)
- ``alias``/``sort``/``is_null``/``cast``  (expression.rs:115-137)

Everything delegates to Catalyst column expressions, so predicates built from
Expressions participate in pushdown/pruning exactly like native Spark columns.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F

from .datatypes import arrow_to_spark


def _unwrap(value: Any) -> Any:
    """Expression|Column|python literal -> something Spark column ops accept."""
    if isinstance(value, Expression):
        return value._col
    if isinstance(value, pa.Scalar):
        return F.lit(value.as_py())
    return value


def to_column(value: Any) -> Column:
    """Coerce Expression / Column / column-name / literal into a Column."""
    if isinstance(value, Expression):
        return value._col
    if isinstance(value, Column):
        return value
    if isinstance(value, str):
        return F.col(value)
    if isinstance(value, pa.Scalar):
        return F.lit(value.as_py())
    return F.lit(value)


class Expression:
    """A composable column expression (reference ``src/expression.rs:28-32``)."""

    __slots__ = ("_col",)

    def __init__(self, col: Column):
        if not isinstance(col, Column):
            col = to_column(col)
        self._col = col

    # -- interop ----------------------------------------------------------
    @property
    def column(self) -> Column:
        """Underlying pyspark Column (escape hatch)."""
        return self._col

    def __repr__(self) -> str:
        return f"Expression({self._col})"

    # -- comparisons (expression.rs:48-58) --------------------------------
    def __eq__(self, other):  # type: ignore[override]
        return Expression(self._col == _unwrap(other))

    def __ne__(self, other):  # type: ignore[override]
        return Expression(self._col != _unwrap(other))

    def __lt__(self, other):
        return Expression(self._col < _unwrap(other))

    def __le__(self, other):
        return Expression(self._col <= _unwrap(other))

    def __gt__(self, other):
        return Expression(self._col > _unwrap(other))

    def __ge__(self, other):
        return Expression(self._col >= _unwrap(other))

    def __hash__(self):
        return object.__hash__(self)

    # -- arithmetic (expression.rs:64-82) ---------------------------------
    def __add__(self, other):
        return Expression(self._col + _unwrap(other))

    def __radd__(self, other):
        return Expression(_unwrap(other) + self._col)

    def __sub__(self, other):
        return Expression(self._col - _unwrap(other))

    def __rsub__(self, other):
        return Expression(to_column(other) - self._col)

    def __mul__(self, other):
        return Expression(self._col * _unwrap(other))

    def __rmul__(self, other):
        return Expression(self._col * _unwrap(other))

    def __truediv__(self, other):
        # deliberate deviation: Spark `/` always returns double, while the
        # reference engine truncates int/int (DataFusion 24 arithmetic).
        # Use .div() for the truncating integer form.
        return Expression(self._col / _unwrap(other))

    def __rtruediv__(self, other):
        return Expression(to_column(other) / self._col)

    def div(self, other):
        """Integer (truncating, toward zero) division — DataFusion's
        int/int `/`, via Spark's IntegralDivide (`div`), which truncates
        toward zero exactly like the reference (verified: -7 div 2 = -3).
        Requires integral operands, same as the reference's int/int form.

        The previous (a - a%b)/b formulation routed through DOUBLE
        division, silently losing exactness for |values| > 2^53 (e.g.
        2^62+1 came back off by one after the long cast)."""
        a, b = self._col, _unwrap(other)
        return Expression(F.call_function("div", a, b))

    def __mod__(self, other):
        return Expression(self._col % _unwrap(other))

    def __rmod__(self, other):
        return Expression(to_column(other) % self._col)

    # -- boolean (expression.rs:84-94) ------------------------------------
    def __and__(self, other):
        return Expression(self._col & _unwrap(other))

    def __or__(self, other):
        return Expression(self._col | _unwrap(other))

    def __invert__(self):
        return Expression(~self._col)

    # -- nested access (expression.rs:96-102) -----------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return Expression(self._col.getField(key))
        return Expression(self._col.getItem(key))

    # -- named methods (expression.rs:104-137) ----------------------------
    def alias(self, name: str) -> "Expression":
        return Expression(self._col.alias(name))

    def sort(self, ascending: bool = True, nulls_first: bool = True) -> "Expression":
        """Sort-key expression (reference expression.rs:120-123)."""
        if ascending:
            c = self._col.asc_nulls_first() if nulls_first else self._col.asc_nulls_last()
        else:
            c = self._col.desc_nulls_first() if nulls_first else self._col.desc_nulls_last()
        return Expression(c)

    def is_null(self) -> "Expression":
        return Expression(self._col.isNull())

    def is_not_null(self) -> "Expression":
        return Expression(self._col.isNotNull())

    def cast(self, to: "pa.DataType | str") -> "Expression":
        """Cast to a pyarrow DataType (reference contract) or Spark type string."""
        if isinstance(to, pa.DataType):
            return Expression(self._col.cast(arrow_to_spark(to)))
        return Expression(self._col.cast(to))

    def in_list(self, values, negated: bool = False) -> "Expression":
        vals = [_unwrap(v) for v in values]
        c = self._col.isin(*vals)
        return Expression(~c if negated else c)

    def between(self, low, high) -> "Expression":
        return Expression(self._col.between(_unwrap(low), _unwrap(high)))

    def like(self, pattern: str) -> "Expression":
        return Expression(self._col.like(pattern))

    def startswith(self, prefix) -> "Expression":
        return Expression(self._col.startswith(_unwrap(prefix)))

    def endswith(self, suffix) -> "Expression":
        return Expression(self._col.endswith(_unwrap(suffix)))
