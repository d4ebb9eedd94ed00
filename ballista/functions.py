"""Re-export of the functions module (reference ``ballista/functions.py:22-23``
does the same passthrough to ``_internal.functions``)."""

from datafusion_ballista_python_spark.functions import *  # noqa: F401,F403
from datafusion_ballista_python_spark.functions import __all__  # noqa: F401


def __getattr__(name: str):
    import datafusion_ballista_python_spark.functions as _f

    try:
        return getattr(_f, name)
    except AttributeError:
        raise ImportError(f"cannot import name '{name}' from 'ballista.functions'")
