"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /``oracle_sql()``
expose the corpus registry (datafusion_ballista_python_spark.corpus) — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB oracle
unless the op is not SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_ballista_python_spark.corpus import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _driver_history() -> tuple[set[str], set[str], dict[str, int]]:
    """(sampled, latest_failed, last_round): corpus entries that already
    received a driver correctness row in any past round, the subset whose
    LATEST driver row failed, and each entry's most recent sampled round
    (read from the recorded CORRECTNESS_r*.json files, round order)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    latest: dict[str, bool] = {}  # key -> passed in its most recent sample
    last_round: dict[str, int] = {}

    def round_no(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)", path)
        return int(m.group(1)) if m else 0

    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")), key=round_no):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        seen |= set(rows)
        for key, row in rows.items():
            last_round[key] = max(last_round.get(key, 0), round_no(path))
            if isinstance(row, dict):
                latest[key] = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match", True)
                )
    failed = {k for k, ok in latest.items() if not ok}
    return seen, failed, last_round


# Entries that pre-date round 6 but have never received a driver
# correctness row (r5 verdict "Next round" item #1): they must stay at the
# head of the fresh tier ahead of any round-6 additions, regardless of
# module import order, so the 50-entry sample finally reaches them.
_CERTIFICATION_DEBT = [
    "q21_suppliers_waiting",
    "train_ngram_contamination",
    "train_pack_sequences",
    "train_repetition_metrics",
    "train_chunk_documents",
    "train_mixture_sample",
    "train_build_vocab",
    "train_epoch_shards",
    "train_encode_documents",
    "train_bpe_merges",
]


# Entries whose SEMANTICS (result values at the driver SF) changed in round
# 6 after an earlier driver certification: their latest driver row is green
# but certified the OLD query, so they queue right after the never-sampled
# tier for re-certification.  Self-clearing: once an entry has a driver row
# from round >= _CHANGED_IN_ROUND it leaves the tier.
_CHANGED_IN_ROUND = 6
_ROUND6_CHANGED = [
    # vacuity de-vacuizations + the added violation rule (this session)
    "q6_revenue_pushdown",
    "join_anti",
    "set_union_distinct",
    "q22_sales_opportunity",
    "fn_string_pad_split",
    "dq_constraints_orders",
    # lockstep operator+oracle fixes from the round-6 review passes whose
    # recorded green rows certified the pre-fix results
    "fn_regexp_ops",            # de-vacuized pattern, group-index fix
    "text_winnow_fingerprints", # boundary-length window fix
    "dedup_winnow_jaccard",     # same winnow kernel fix
    "stream_stateful_user_stats",  # NULL-exclusion in the running stats
    "layout_zorder_values",     # exact IntegralDivide quantization
    "dedup_bloom_prefilter",    # normalized-fingerprint novelty contract
]


def _rotated(reg: dict) -> list[str]:
    """Entries whose LATEST driver row FAILED first (a fix can only earn a
    green row if the sampler reaches it — and the failed tier must lead,
    because the never-sampled tier can exceed the sample size when a round
    adds many entries), then never-driver-sampled entries (oldest
    certification debt first), then entries changed since their last
    certification (until a driver row from the changing round or later
    re-certifies them), then the rest — relative order preserved within
    each tier."""
    seen, failed, last_round = _driver_history()
    names = list(reg)
    refail = [n for n in names if n in failed]
    debt = [n for n in _CERTIFICATION_DEBT if n in reg and n not in seen]
    fresh = [n for n in names if n not in seen and n not in debt]
    changed = [
        n for n in _ROUND6_CHANGED
        if n in reg
        and n in seen
        and n not in failed
        and last_round.get(n, 0) < _CHANGED_IN_ROUND
    ]
    rest = [
        n for n in names if n in seen and n not in failed and n not in changed
    ]
    return refail + debt + fresh + changed + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = load_all()
    return {name: reg[name].fn for name in _rotated(reg)}


def oracle_sql() -> dict[str, str]:
    reg = load_all()
    return {
        name: reg[name].oracle for name in _rotated(reg) if reg[name].oracle is not None
    }
