"""API-shape tests mirroring the reference's ballista/tests/test_imports.py
(module identity :31-32, class paths :35-43, functions re-export incl the
negative ImportError case :46-54, subclassability :57-65)."""

import pytest


def test_import_ballista_package():
    import ballista

    assert ballista is not None


def test_public_classes_importable():
    from ballista import (
        Accumulator,
        BallistaContext,
        DataFrame,
        Executor,
        Expression,
        ScalarUDF,
        Scheduler,
    )

    for cls in (BallistaContext, DataFrame, Expression, Accumulator, ScalarUDF, Scheduler, Executor):
        assert isinstance(cls, type)


def test_functions_submodule_reexport():
    import ballista.functions as f

    assert callable(f.col)
    assert callable(f.count_star)
    assert callable(f.md5)


def test_functions_submodule_negative_import():
    with pytest.raises(ImportError):
        from ballista.functions import definitely_not_a_function  # noqa: F401


def test_classes_subclassable():
    from ballista import BallistaContext, DataFrame, Expression

    class MyContext(BallistaContext):  # noqa: B903
        pass

    class MyDataFrame(DataFrame):
        pass

    class MyExpression(Expression):
        pass

    assert issubclass(MyContext, BallistaContext)
    assert issubclass(MyDataFrame, DataFrame)
    assert issubclass(MyExpression, Expression)


def test_udf_udaf_callable():
    from ballista import udaf, udf

    assert callable(udf)
    assert callable(udaf)
