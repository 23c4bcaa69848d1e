"""Lint guard for the F.aggregate nullability trap (r9 verdict task 6).

``F.aggregate`` coerces every merge result to the INIT expression's
schema, including its (non-)nullability — so a fold whose lambda can
produce NULL (a NULL array element, a zip_with length pad, a when-chain
with no otherwise) silently decays that NULL state to the init's zero
instead of propagating it. This cost a debugging detour in Holt-Winters
(r9) and nearly a silent wrong answer pre-1970 (r9 ADVICE).

The guard: every ``F.aggregate(`` callsite in the package must carry a
``fold-state:`` comment within the preceding few lines stating WHY the
fold can never see NULL state (or what the caller contract is). A new
callsite without the acknowledgment fails here, so the next F.aggregate
user cannot re-hit the trap silently.
"""

from __future__ import annotations

import glob
import os
import re

PKG = "hmpps_digital_prison_reporting_glue_poc_spark"
MARKER = "fold-state:"
WINDOW = 8  # lines above the callsite in which the marker must appear


def _scan_files():
    files = sorted(
        glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)
    )
    files.append("__spark_entry__.py")
    return files


def test_every_aggregate_callsite_acknowledges_fold_state():
    missing = []
    total = 0
    for path in _scan_files():
        with open(path, encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        for i, ln in enumerate(lines):
            if re.search(r"\bF\.aggregate\(", ln):
                total += 1
                lo = max(0, i - WINDOW)
                window = "\n".join(lines[lo : i + 1])
                if MARKER not in window:
                    missing.append(f"{path}:{i + 1}")
    assert total >= 10, "scan must actually find the known callsites"
    assert not missing, (
        "F.aggregate callsites without a 'fold-state:' acknowledgment "
        "comment (the init's non-nullable schema silently decays NULL "
        f"merge state to zero — document why that cannot happen): {missing}"
    )


def test_marker_is_not_vacuous():
    # the guard is only meaningful if the marker convention is in use
    found = 0
    for path in _scan_files():
        with open(path, encoding="utf-8") as fh:
            found += fh.read().count(MARKER)
    assert found >= 10
