"""Error types mirroring the reference's error surface.

The reference converts engine errors into Python exceptions
(``BallistaError``, reference ``src/errors.rs:25-111``).  We keep the same
top-level exception name so user code that catches ``BallistaError``
keeps working, and we replicate the message shape of the explicit
errors raised by the binding (e.g. the unknown-join-type message at
reference ``src/dataframe.rs:146-152``).
"""

from __future__ import annotations


class BallistaError(Exception):
    """Base error for the engine (reference ``src/errors.rs:25``)."""


class DataFusionError(BallistaError):
    """Planning/analysis error (reference ``src/errors.rs`` Common/DataFusion arms)."""


class NotYetImplemented(BallistaError):
    """Feature documented but not implemented yet."""


def unknown_join_type(how: str) -> BallistaError:
    # message shape per reference src/dataframe.rs:147-151
    return BallistaError(
        f"unsupported join type {how!r}. Supported types: inner, left, right, "
        "full, semi, anti, right_semi"
    )
