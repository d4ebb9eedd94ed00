#!/usr/bin/env python
"""Maintain tools/oracle_ledger.json: per corpus entry, the content
fingerprint (corpus.entry_fingerprint — sha256 of oracle SQL + corpus-fn
source) in effect when the entry's LAST GREEN driver row certified it.

Run at ROUND START, before making any changes: the driver sampled the
previous round's final commit, so each entry's current fingerprint equals
the one its newest green row certified.  The rotation in
__spark_entry__.py then auto-queues any entry whose fingerprint drifts
from the ledger during the round — the mechanical replacement for the
hand-maintained changed list (r6 verdict item #5).

Update rule: an entry's ledger row is (re)written only when a green
driver row NEWER than the recorded one exists; an entry edited after its
last certification keeps its old (certified) fingerprint, which is what
makes the drift detectable.

``--rev REV`` computes fingerprints at a past git revision via a
temporary worktree — for initializing the ledger mid-round, after edits
have already landed on HEAD.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LEDGER = os.path.join(HERE, "oracle_ledger.json")

sys.path.insert(0, REPO)


def current_fingerprints() -> dict[str, str]:
    from datafusion_ballista_python_spark.corpus import entry_fingerprint, load_all

    return {name: entry_fingerprint(spec) for name, spec in load_all().items()}


# the hashing is inlined (not imported) so the tool can fingerprint
# revisions that predate corpus.entry_fingerprint itself — it MUST stay
# byte-identical to that function's definition
_SUBPROC = """
import hashlib, inspect, json, sys
sys.path.insert(0, {repo!r})
from datafusion_ballista_python_spark.corpus import load_all


def fp(spec):
    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):
        src = repr(spec.fn)
    return hashlib.sha256(
        ((spec.oracle or "") + "\\n\\x00\\n" + src).encode()
    ).hexdigest()


print(json.dumps({{n: fp(s) for n, s in load_all().items()}}))
"""


def fingerprints_at_rev(rev: str) -> dict[str, str]:
    """Fingerprints computed from a temporary worktree at ``rev``."""
    with tempfile.TemporaryDirectory(prefix="ledger_wt_") as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, rev],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", _SUBPROC.format(repo=wt)],
                check=True, capture_output=True, text=True,
            ).stdout
            return json.loads(out)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, check=False, capture_output=True,
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", help="git revision to fingerprint (default: working tree)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry

    seen, failed, last_round = entry._driver_history()
    green_round = {
        n: last_round.get(n, 0) for n in seen if n not in failed
    }
    fps = fingerprints_at_rev(args.rev) if args.rev else current_fingerprints()

    try:
        with open(LEDGER) as fh:
            ledger = json.load(fh)
    except FileNotFoundError:
        ledger = {}

    updated = []
    for name, rnd in sorted(green_round.items()):
        if name not in fps:  # renamed/removed entry: drop stale row below
            continue
        prev = ledger.get(name)
        if prev is None or rnd > prev.get("round", -1):
            ledger[name] = {"fingerprint": fps[name], "round": rnd}
            updated.append(name)
    stale = [n for n in ledger if n not in fps]
    for n in stale:
        del ledger[n]

    if args.dry_run:
        print(json.dumps({"would_update": updated, "would_drop": stale}))
        return
    with open(LEDGER, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        json.dumps(
            {"entries": len(ledger), "updated": len(updated), "dropped": stale}
        )
    )


if __name__ == "__main__":
    main()
