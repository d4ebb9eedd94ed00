"""Drop-in ``ballista`` compatibility package.

A user of apache/datafusion-ballista-python imports
``from ballista import BallistaContext, col, lit, udf, udaf, Accumulator``
(reference ``ballista/__init__.py:28-44``).  This shim re-exports our
PySpark-native implementations under the same module name so existing
scripts run unchanged.
"""

from datafusion_ballista_python_spark import (  # noqa: F401
    Accumulator,
    BallistaContext,
    BallistaError,
    DataFrame,
    Executor,
    Expression,
    ScalarUDF,
    Scheduler,
    col,
    column,
    lit,
    literal,
    udaf,
    udf,
    udtf,
)
from datafusion_ballista_python_spark import functions  # noqa: F401

__all__ = [
    "Accumulator",
    "BallistaContext",
    "BallistaError",
    "DataFrame",
    "Expression",
    "ScalarUDF",
    "Scheduler",
    "Executor",
    "col",
    "column",
    "lit",
    "literal",
    "udf",
    "udaf",
    "udtf",
    "functions",
]
