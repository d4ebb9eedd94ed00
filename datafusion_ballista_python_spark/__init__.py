"""datafusion_ballista_python_spark — a PySpark-native analytics engine with
the query surface of apache/datafusion-ballista-python (PyBallista).

Public API mirrors the reference's ``ballista`` package
(``ballista/__init__.py:28-115`` in the reference): ``BallistaContext``,
``DataFrame``, ``Expression``, ``col``/``lit``, ``udf``/``udaf`` +
``Accumulator``, plus the ``functions`` submodule.  Execution is Catalyst +
Tungsten + AQE instead of DataFusion + Ballista; see SURVEY.md for the
capability mapping.

Extensions beyond the reference live in subpackages:
``operators`` (dedup / similarity / text analysis / multimodal),
``streaming`` (Structured Streaming), ``plans`` (plan-quality tooling).
"""

from . import functions  # noqa: F401
from .cluster import Executor, Scheduler  # noqa: F401
from .context import BallistaContext  # noqa: F401
from .dataframe import DataFrame  # noqa: F401
from .datatypes import arrow_to_spark, spark_to_arrow  # noqa: F401
from .errors import BallistaError, DataFusionError  # noqa: F401
from .expression import Expression  # noqa: F401
from .functions import col, column, lit, literal  # noqa: F401
from .udaf import udaf  # noqa: F401
from .udtf import register_udtf, udtf  # noqa: F401
from .udf import Accumulator, ScalarUDF, udf  # noqa: F401

__version__ = "0.4.0"

__all__ = [
    "BallistaContext",
    "DataFrame",
    "Expression",
    "Accumulator",
    "ScalarUDF",
    "Scheduler",
    "Executor",
    "BallistaError",
    "DataFusionError",
    "col",
    "column",
    "lit",
    "literal",
    "udf",
    "udaf",
    "udtf",
    "register_udtf",
    "functions",
]
