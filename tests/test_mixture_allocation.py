"""mixture_allocation contract tests: hand-computed allocation, the cap,
zero-share reporting for unnamed groups, normalization, error surface."""

from __future__ import annotations

import pytest

from datafusion_ballista_python_spark.operators.training import (
    mixture_allocation,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, toks long")


def _run(spark, rows, targets, **kw):
    out = mixture_allocation(
        _df(spark, rows), "lang", targets, token_col="toks", **kw
    ).collect()
    return {r["group"]: r.asDict() for r in out}


BASE = [(0, "en", 800), (1, "en", 200), (2, "de", 100)]


def test_hand_computed(spark):
    got = _run(
        spark, BASE, {"en": 0.5, "de": 0.5}, budget=1000.0, max_epochs=4.0
    )
    en, de = got["en"], got["de"]
    assert en["avail_tokens"] == 1000 and de["avail_tokens"] == 100
    # en: desired 500 -> 0.5 epochs, uncapped
    assert en["epochs"] == 0.5 and not en["capped"]
    assert en["allocated_tokens"] == 500.0
    # de: desired 500 vs cap 400 -> capped at 4 epochs
    assert de["epochs"] == 4.0 and de["capped"]
    assert de["allocated_tokens"] == 400.0
    assert en["realized_share"] == round(500 / 900, 6)
    assert de["realized_share"] == round(400 / 900, 6)


def test_unnamed_group_reported_with_zero(spark):
    got = _run(spark, BASE, {"en": 1.0}, budget=100.0)
    assert got["de"]["target_share"] == 0.0
    assert got["de"]["allocated_tokens"] == 0.0
    assert "de" in got  # not silently dropped


def test_targets_normalized(spark):
    a = _run(spark, BASE, {"en": 0.5, "de": 0.5}, budget=1000.0)
    b = _run(spark, BASE, {"en": 2.0, "de": 2.0}, budget=1000.0)
    assert a == b


def test_absent_target_group_raises(spark):
    with pytest.raises(ValueError, match="absent groups"):
        _run(spark, BASE, {"en": 0.5, "fr": 0.5})


def test_error_surface(spark):
    with pytest.raises(ValueError, match="budget"):
        _run(spark, BASE, {"en": 1.0}, budget=0.0)
    with pytest.raises(ValueError, match="max_epochs"):
        _run(spark, BASE, {"en": 1.0}, max_epochs=0.0)
    with pytest.raises(ValueError, match="sum to 0"):
        _run(spark, BASE, {"en": 0.0})
