"""Vacuity regression gate: a corpus entry whose oracle hash-matches can
still be VACUOUS — round 6's audit (tools/vacuity_audit.py) found
fn_regexp_ops matching zero documents (hid a real crash), join_anti and
q22 returning 0 rows at the driver's own sf0.01 gate, and
fn_string_pad_split's index-2 extraction arm always empty.  This module
pins the de-vacuized state so it cannot silently regress.

All checks run the DUCKDB oracle only (fast, no Spark): the driver's hash
gate already forces the Spark result to equal the oracle, so the oracle's
shape IS the entry's shape.
"""

import os

import pytest

from datafusion_ballista_python_spark.corpus import load_all

from .conftest import SF_DIR
from .oracle_harness import duckdb_con

_REGISTRY = load_all()
_ORACLE_NAMES = [n for n, s in _REGISTRY.items() if s.oracle is not None]

# the driver-gate SF is SF_DIR's sibling, respecting the same relocation
# env var the rest of the suite uses (SPARK_GRAFT_TEST_SF_DIR)
DRIVER_SF_DIR = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")

# Legitimately empty at sf0.001 ONLY (data too small for the predicate to
# fire) — each is proven non-empty at the driver's sf0.01 gate by
# test_empty_ok_entries_fire_at_driver_sf below.  Anything else returning
# zero rows is a vacuous hash match and FAILS.
EMPTY_OK_AT_SF0001 = {
    "q2_min_supplier",
    "q7_volume_shipping",
    "q20_potential_promotion",
}


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_not_degenerate(con, name):
    """One sweep, two shape gates sharing the result frame: non-empty, and
    no entirely-NULL column (q6's 1994 window summed zero rows into one
    row of NULL revenue — a NULL=NULL hash match the row-count gate can't
    see).  A column legitimately all-NULL at some SF needs an explicit
    allowlist entry here with the reason."""
    if name in EMPTY_OK_AT_SF0001:
        return  # covered by the sf0.01 check below
    df = con.sql(_REGISTRY[name].oracle).df()
    assert len(df) >= 1, (
        f"{name}: oracle returns 0 rows at sf0.001 — vacuous hash match"
    )
    all_null = [c for c in df.columns if df[c].isna().all()]
    assert not all_null, f"{name}: entirely-NULL column(s) {all_null}"


def test_empty_ok_entries_fire_at_driver_sf():
    con01 = duckdb_con(DRIVER_SF_DIR)
    for name in sorted(EMPTY_OK_AT_SF0001):
        n = len(con01.sql(_REGISTRY[name].oracle).df())
        assert n >= 1, (
            f"{name}: empty at the DRIVER's sf0.01 gate too — the sf0.001 "
            "allowlisting is no longer an SF artifact; de-vacuize the entry"
        )


def test_split_part_second_field_not_vacuous(con):
    df = con.sql(_REGISTRY["fn_string_pad_split"].oracle).df()
    assert (df["word2"] != "").all(), "index-2 split arm is empty again"
    assert (df["word1"] != "").all()


def test_anti_join_actually_drops_rows(con):
    """join_anti must both return rows AND have dropped some — an anti
    join equal to the unfiltered input never exercised row-dropping."""
    kept = int(con.sql(_REGISTRY["join_anti"].oracle).df()["n"].sum())
    total = con.sql("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert 1 <= kept < total


def test_union_distinct_actually_collapses(con):
    """The distinct union must actually COLLAPSE rows: running the
    entry's own oracle with UNION rewritten to UNION ALL must yield
    strictly more rows.  Derived from the registry oracle (not a
    hand-copied predicate) so a future threshold change cannot silently
    decouple this guard from the entry it pins."""
    oracle = _REGISTRY["set_union_distinct"].oracle
    assert "UNION ALL" not in oracle and "UNION" in oracle
    n_distinct = len(con.sql(oracle).df())
    n_all = len(con.sql(oracle.replace("UNION", "UNION ALL")).df())
    assert n_distinct >= 1
    assert n_all > n_distinct, (
        "distinct union never collapses anything at this SF — sides are "
        "empty or disjoint; de-vacuize the entry thresholds"
    )


# Shared driver-SF connection for the full-corpus sweep below (the
# parametrized per-entry gate at sf0.001 uses the function-scoped `con`).
@pytest.fixture(scope="module")
def con01():
    return duckdb_con(DRIVER_SF_DIR)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_not_degenerate_at_driver_sf(con01, name):
    """Same two shape gates at the DRIVER's sf0.01 — the SF the hash gate
    actually runs at (r6 verdict #6: the q6 class is SF-dependent; a
    window can be empty at one SF and not another, and a vacuous match at
    the driver SF is precisely the one that certifies nothing)."""
    df = con01.sql(_REGISTRY[name].oracle).df()
    assert len(df) >= 1, (
        f"{name}: oracle returns 0 rows at the driver's sf0.01 gate — "
        "vacuous hash match"
    )
    all_null = [c for c in df.columns if df[c].isna().all()]
    assert not all_null, f"{name}: entirely-NULL column(s) {all_null} at sf0.01"


def test_multi_sf_audit_report_is_current_and_clean():
    """Pins the committed 3-SF Spark-side audit
    (tools/vacuity_audit.py --all-sfs -> tools/vacuity_report.json):
    every corpus entry must appear in every SF section — so ADDING an
    entry without re-running the sweep fails here, which is the
    freshness forcing function — and no entry may carry EMPTY_RESULT /
    ALL_NULL / ERROR flags.  sf0.1 is the bench SF: an entry vacuous
    there renders its bench number meaningless even when the sf0.01
    correctness gate is green."""
    import json

    from tools.vacuity_audit import AUDIT_VERSION

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "vacuity_report.json")
    assert os.path.exists(path), "run: python tools/vacuity_audit.py --all-sfs"
    with open(path) as fh:
        report = json.load(fh)
    # detector-version stamp (r10 advisor): a detector change bumps
    # AUDIT_VERSION in tools/vacuity_audit.py, and a report generated by
    # the OLD detectors fails here until the sweep is re-run — the
    # committed invariants can no longer silently certify against
    # tooling with known recall holes.
    assert report.get("_audit_version") == AUDIT_VERSION, (
        "vacuity_report.json was generated by a different detector set "
        f"(report {report.get('_audit_version')} != code {AUDIT_VERSION}) "
        "— re-run: python tools/vacuity_audit.py --all-sfs"
    )
    assert set(report) - {"_audit_version"} == {"sf0.001", "sf0.01", "sf0.1"}
    for sf, entries in report.items():
        if sf.startswith("_"):
            continue
        missing = sorted(set(_REGISTRY) - set(entries))
        assert not missing, (
            f"{sf}: corpus entries missing from the committed audit "
            f"report {missing} — re-run tools/vacuity_audit.py --all-sfs"
        )
        for name, row in entries.items():
            bad = [
                fl for fl in row["flags"]
                if fl == "EMPTY_RESULT"
                or fl.startswith("ALL_NULL:")
                or fl.startswith("ERROR:")
                # corpus-wide zero-negative-zero invariant (r9 verdict
                # task #3): no hashed float column may contain -0.0 —
                # engines disagree on ROUND sign preservation, and the
                # driver hash is bit-sensitive where == is not.  Fold
                # with + F.lit(0.0) (operator) / + 0 (oracle).
                or fl.startswith("NEG_ZERO:")
                # corpus-wide zero-NaN invariant (r10): the oracles emit
                # zero NaN (measured, every float output at sf0.01), and
                # BOTH engines' pandas conversions fold NULL and NaN to
                # NaN — so a Spark-side NaN would replay MATCH locally
                # while the driver's null-bitmap-aware hash diverges.
                # Express missing as NULL, never NaN.
                or fl.startswith("HAS_NAN:")
                # oracle-side sweep (r10 advisor): the r7-r9 root cause
                # was DuckDB-side -0.0; the invariants are two-sided now
                or fl.startswith("ORACLE_NEG_ZERO:")
                or fl.startswith("ORACLE_HAS_NAN:")
                or fl.startswith("ORACLE_ERROR:")
            ]
            if sf == "sf0.001" and name in EMPTY_OK_AT_SF0001:
                bad = [fl for fl in bad if fl != "EMPTY_RESULT"]
            assert not bad, f"{sf}/{name}: {bad}"


def test_audit_const_flags_are_sf_artifacts_or_by_design():
    """The round-6 audit's two CONST findings, pinned: q8's mkt_share is
    const-zero at sf0.001 only (nonzero at the driver's sf0.01 gate —
    the ASIA-supplier share really is 0 in the tiny sample), and
    agg_approx_distinct's approx_ok is constant TRUE by design (it IS
    the accuracy contract: were the HLL estimate out of tolerance the
    flag would flip false and the hash would catch it)."""
    con01 = duckdb_con(DRIVER_SF_DIR)
    q8 = con01.sql(_REGISTRY["q8_market_share"].oracle).df()
    assert (q8["mkt_share"] != 0).any(), "q8 mkt_share zero at driver SF too"
    ok = con01.sql(_REGISTRY["agg_approx_distinct"].oracle).df()["approx_ok"]
    assert ok.all(), "HLL accuracy contract violated at driver SF"


def test_round7_audit_flag_arms_fire_at_driver_sf():
    """Round-7 3-SF sweep follow-ups, pinned at the driver SF: the
    outlier gate, the null-profile arm, and the regexp boolean must all
    exercise BOTH arms (each was constant at every SF before the round-7
    de-vacuizations: |z|>2 could never fire on near-uniform totalprice,
    no table carries NULLs, and no document contains a digit).  The
    remaining CONST flags are SF/data artifacts with their own pins:
    fn_timestamp_convert's hour is id-prefix-bound (varies at sf0.01,
    asserted here), maximal_repeated_spans' start_pos=0 reflects
    prefix-planted duplicates (nonzero-start arithmetic pinned by
    test_maximal_repeated_spans_counts_within_doc_repeats), and
    sketch_count_min's exact flag varies at sf0.01."""
    con01 = duckdb_con(DRIVER_SF_DIR)
    out = con01.sql(_REGISTRY["dq_outlier_gate"].oracle).df()["is_outlier"]
    assert out.any() and not out.all(), "outlier gate arm dead at driver SF"
    prof = con01.sql(_REGISTRY["dq_profile_orders"].oracle).df()
    nn = prof.set_index("column")["n_nulls"]
    assert nn["opt_priority"] > 0 and nn["o_orderkey"] == 0
    rex = con01.sql(_REGISTRY["fn_regexp_ops"].oracle).df()["mentions_line"]
    assert rex.any() and not rex.all(), "regexp boolean arm dead"
    h = con01.sql(_REGISTRY["fn_timestamp_convert"].oracle).df()["h"]
    assert h.nunique() > 1, "hour arm constant at driver SF"
    ex = con01.sql(_REGISTRY["sketch_count_min"].oracle).df()["exact"]
    assert not ex.all(), "count-min exact flag never false at driver SF"




# KNIFE_EDGE flags (r9 boundary audit, VERDICT r8 task #7): result rows
# sitting EXACTLY on a gate literal from the oracle SQL.  A boundary row
# is only FRAGILE when its upstream arithmetic is engine-DEPENDENT (the
# r8 dq_mad_outlier_gate failure: chained interpolated percentiles).
# Every entry below is the SAFE class — the boundary value derives from
# exact integer counts (set-overlap ratios, Gopher char/word-class
# fractions), exact DECIMAL sums (z-score mean/std), or a fixed-order
# elementwise array sum (cosine) — one engine-independent IEEE sequence,
# so the row compares the SAME double against the same literal in both
# engines.  Each was driver-certified green WITH its boundary row
# present.  A NEW knife-edge must either join this list with the same
# upstream-exactness argument or move its gate off the reachable grid
# (the k=1.23456 convention).
KNIFE_EDGE_SAFE = {
    "dedup_ngram_jaccard": "jaccard = exact |intersect|/|union| integer ratio",
    "text_gopher_gate": "all Gopher fractions are exact integer-count ratios",
    "dedup_containment_join": "containment = exact |intersect|/min ratio",
    "dq_outlier_gate": "mean/std from exact DECIMAL (n, sum, sumsq)",
    "train_embed_contamination": "cosine = fixed-index-order elementwise sum",
    "dedup_minhash_lsh": "verify-stage jaccard = exact integer ratio",
}


def test_knife_edge_flags_are_allowlisted_safe():
    """Freshness forcing function for the boundary audit: every
    KNIFE_EDGE flag in the committed 3-SF report must belong to an entry
    with a reasoned upstream-exactness note above; an unlisted one means
    a new gate with a row ON it — decide (harden or prove safe) before
    shipping.  CHAINED_PERCENTILES must never appear (the static
    corpus-wide invariant is also pinned in test_knife_edge.py)."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "vacuity_report.json")
    with open(path) as fh:
        report = json.load(fh)
    unexplained = {}
    for sf, entries in report.items():
        if sf.startswith("_"):
            continue
        for name, row in entries.items():
            for fl in row["flags"]:
                if fl.startswith("CHAINED_PERCENTILES"):
                    unexplained[f"{sf}/{name}"] = fl
                elif fl.startswith("KNIFE_EDGE") and name not in KNIFE_EDGE_SAFE:
                    unexplained[f"{sf}/{name}"] = fl
    assert not unexplained, (
        f"unallowlisted knife-edge/chained-percentile flags: {unexplained}"
    )
