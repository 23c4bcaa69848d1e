"""Refactor-dirtiness tracking + driver-rotation contract (r8 verdict
tasks 1 and 2).

Round 8's kruskal_wallis break proved a shared-helper refactor can damage
a driver-green query silently; these tests pin the machinery that now
front-loads every such query into the next driver rotation window:

- the generated dirty set is a SUPERSET of the hand-maintained
  ``_R12_CHANGED`` floor (the verdict's done-criterion);
- the rotation orders dirty -> never-checked-green -> oldest-first;
- the import map actually connects queries to the operator modules they
  execute (and does NOT over-connect pure-DataFrame queries);
- ``_latest_driver_rounds`` reads the committed CORRECTNESS artifacts
  (green rows only) so the staleness tiering updates itself per round.
"""

from __future__ import annotations

import json

import pytest

import __spark_entry__ as entry_mod
from hmpps_digital_prison_reporting_glue_poc_spark import fingerprint as fp

PKG = "hmpps_digital_prison_reporting_glue_poc_spark"


@pytest.fixture(scope="module")
def registry():
    return entry_mod._all_queries()


@pytest.fixture(scope="module")
def module_map(registry):
    return fp.query_module_map(registry, entry_mod)


def test_generated_dirty_superset_of_hand_list():
    generated = entry_mod._dirty_rotation_set()
    assert entry_mod._R12_CHANGED <= generated, (
        "the generated dirty set must cover the hand-maintained floor"
    )
    # The defensive fallback must never have fired (r10 advice: a silent
    # fingerprinting failure would degrade the rotation to the hand
    # floor alone — with a near-empty floor, front-loading nothing).
    assert entry_mod._DIRTY_SET_ERROR is None, entry_mod._DIRTY_SET_ERROR


def test_rotation_order_dirty_then_never_then_oldest(registry):
    ordered = list(entry_mod.queries())
    assert set(ordered) == set(registry)
    dirty = entry_mod._dirty_rotation_set()
    latest = entry_mod._LATEST_DRIVER_ROUND

    def tier(name):
        if name in dirty:
            return 0
        r = latest.get(name)
        return 1 if r is None else 1 + r

    tiers = [tier(n) for n in ordered]
    assert tiers == sorted(tiers), "rotation must be non-decreasing by tier"
    # within a tier the name tie-break keeps the order deterministic
    for i in range(len(ordered) - 1):
        if tiers[i] == tiers[i + 1]:
            assert ordered[i] < ordered[i + 1]


def test_latest_rounds_read_from_artifacts():
    latest = entry_mod._latest_driver_rounds()
    # Discover the newest committed artifact at runtime (r9 verdict task 1:
    # hardcoding a round number made this test self-break every time the
    # driver dropped the next CORRECTNESS_rNN.json into the repo).
    import glob
    import re

    rounds = sorted(
        int(re.search(r"r(\d+)", p).group(1))
        for p in glob.glob("CORRECTNESS_r*.json")
    )
    assert rounds, "at least one committed CORRECTNESS artifact expected"
    newest = rounds[-1]
    assert newest >= 9  # r9 artifacts are committed; floor only grows
    with open(f"CORRECTNESS_r{newest:02d}.json", encoding="utf-8") as fh:
        art = json.load(fh)
    for name, row in art.items():
        if row.get("rows_match") and row.get("schema_match") and not row.get("err"):
            # green in the newest artifact -> latest round IS that round
            assert latest.get(name) == newest, name
    assert latest["q1_pricing_summary"] >= 3


def test_import_map_connects_operator_queries(module_map):
    assert f"{PKG}.operators.textstats" in module_map["hill_token_tail_alpha"]
    assert f"{PKG}.operators.evaluation" in module_map[
        "brunner_munzel_qty_by_status"
    ]
    assert f"{PKG}.operators.dedup" in module_map["lsh_candidate_pairs"]
    assert f"{PKG}.operators.similarity" in module_map["ann_ivf_topk"]
    # transitive edge: dedup imports functions.text, so any query reaching
    # dedup must also depend on the tokenizer file
    assert f"{PKG}.functions.text" in module_map["lsh_candidate_pairs"]


def test_import_map_does_not_overconnect(module_map):
    # q1 is a pure-DataFrame query written inline in the entry file: its
    # fingerprint covers its own source + helpers, and must NOT drag in
    # operator modules (else any operator edit would dirty all 315).
    assert not any(
        m.startswith(f"{PKG}.operators") for m in module_map["q1_pricing_summary"]
    )


def test_every_query_has_a_fingerprint(registry):
    fps = fp.query_fingerprints(registry, entry_mod.oracle_sql(), entry_mod)
    assert set(fps) == set(registry)
    assert all(len(h) == 64 for h in fps.values())


def test_committed_baseline_covers_registry(registry):
    baseline = fp.load_baseline()
    assert set(baseline) == set(registry), (
        "QUERY_FP.json stale — regenerate with scripts/gen_query_fp.py "
        "(--update CORRECTNESS_rNN.json per round, --write at a "
        "known-good full point)"
    )


def test_dirty_detection_flags_fingerprint_change(tmp_path, registry):
    """End-to-end mechanism check without mutating source files: a
    baseline whose recorded fingerprint differs for exactly one query
    must flag exactly that query."""
    baseline = fp.load_baseline()
    assert baseline, "committed baseline must exist"
    tampered = dict(baseline)
    tampered["q1_pricing_summary"] = "0" * 64
    path = tmp_path / "QUERY_FP.json"
    path.write_text(json.dumps({"fingerprints": tampered}))
    dirty = fp.dirty_queries(
        registry, entry_mod.oracle_sql(), entry_mod, baseline_path=str(path)
    )
    assert "q1_pricing_summary" in dirty
    # nothing else moved (current tree == committed baseline elsewhere,
    # modulo queries legitimately dirty right now)
    legit = fp.dirty_queries(registry, entry_mod.oracle_sql(), entry_mod)
    assert dirty - {"q1_pricing_summary"} == legit


def test_missing_baseline_degrades_to_empty(tmp_path, registry):
    dirty = fp.dirty_queries(
        registry,
        entry_mod.oracle_sql(),
        entry_mod,
        baseline_path=str(tmp_path / "absent.json"),
    )
    assert dirty == set()


def test_helper_edit_reaches_consumers(module_map):
    """The entry helpers (_t/_spread) are hashed into every wrapper that
    references them: verify via the source-capture path."""
    sources = fp._entry_sources(
        entry_mod._all_queries()["q1_pricing_summary"], entry_mod
    )
    joined = "\n".join(sources)
    assert "def _t(" in joined, "q1 must capture the _t helper source"
