"""The operator→evidence contract (VERDICT r6 item 2): every SURVEY.md
§2 operator must keep at least one live evidence source — a registry
query or a named test — so a future official-window rotation can never
silently strand an operator. Pure-Python checks, no SparkSession."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_iot_data_pipeline_project_spark import evidence, registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS_DIR = os.path.join(REPO, "tests")


def _survey_ids() -> set[str]:
    with open(os.path.join(REPO, "SURVEY.md")) as fh:
        return evidence.survey_operator_ids(fh.read())


def test_every_survey_operator_has_an_evidence_entry():
    missing = _survey_ids() - set(evidence.EVIDENCE)
    assert missing == set(), f"SURVEY §2 operators without evidence: {missing}"


def test_no_orphan_evidence_entries():
    """Entries must correspond to real SURVEY §2 operators — a stale map
    is as misleading as a missing one."""
    extra = set(evidence.EVIDENCE) - _survey_ids()
    assert extra == set(), f"evidence entries not in SURVEY §2: {extra}"


def test_every_referenced_query_exists():
    known = set(registry.QUERIES) | set(registry.APPROX_ORACLES)
    for op, ev in evidence.EVIDENCE.items():
        for q in ev["queries"]:
            assert q in known, f"{op} references unknown query {q!r}"


def test_every_referenced_test_resolves():
    cache: dict[str, str] = {}
    for op, ev in evidence.EVIDENCE.items():
        for ref in ev["tests"]:
            fname, _, tname = ref.partition("::")
            path = os.path.join(TESTS_DIR, fname)
            assert os.path.exists(path), f"{op}: no test file {fname}"
            if fname not in cache:
                with open(path) as fh:
                    cache[fname] = fh.read()
            assert re.search(rf"^def {re.escape(tname)}\(", cache[fname],
                             re.M), f"{op}: {ref} does not resolve"


def test_every_operator_has_live_evidence():
    dead = [op for op, ev in evidence.EVIDENCE.items()
            if not ev["queries"] and not ev["tests"]]
    assert dead == [], f"operators with zero evidence sources: {dead}"


def test_committed_report_is_current():
    """EVIDENCE.md must equal the generator output — regenerate with
    `python tools/evidence_report.py` after changing the map or
    rotating the window (tiers are computed from export order)."""
    path = os.path.join(REPO, "EVIDENCE.md")
    assert os.path.exists(path), "EVIDENCE.md missing — run tools/evidence_report.py"
    with open(path) as fh:
        assert fh.read() == evidence.render_report(), (
            "EVIDENCE.md is stale — run tools/evidence_report.py")


def test_official_tier_queries_really_in_window():
    """The tier computation must agree with the export-order contract."""
    order = registry.export_order()
    window = set(order[:evidence.GATE_WINDOW])
    for op, ev in evidence.EVIDENCE.items():
        for q in ev["queries"]:
            tier = evidence.query_tier(q)
            assert (tier == "official") == (q in window), (op, q, tier)
