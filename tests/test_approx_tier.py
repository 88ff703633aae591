"""Approximate-tier queries (percentile_approx / approx_count_distinct)
must agree with their exact twins within the documented sketch error
bounds — the executable version of the '100 TB swap' comments on
q15/q16."""

from __future__ import annotations

import pytest

from real_time_iot_data_pipeline_project_spark import registry
from tests.conftest import SF_SMOKE

from tools.verify_oracles import compare_bounded


@pytest.mark.parametrize("name", sorted(registry.APPROX_ORACLES))
def test_approx_within_bounds(spark, duck, name):
    exact_sql, rel_tol = registry.APPROX_ORACLES[name]
    problems = compare_bounded(
        spark, duck, name, registry.QUERIES[name], exact_sql, SF_SMOKE, rel_tol
    )
    assert not problems, problems


def test_approx_tier_not_exported_as_hashable_oracle():
    # sketches are not bit-reproducible cross-engine: the driver must
    # never hash-compare them
    for name in registry.APPROX_ORACLES:
        assert name in registry.QUERIES
        assert name not in registry.ORACLES


def test_bounded_comparator_rejects_out_of_bound():
    # the comparator itself must fail loudly when the bound is violated
    class FakeCursor:
        description = [("n",)]

        @staticmethod
        def fetchall():
            return [(100.0,)]

    class FakeCon:
        @staticmethod
        def execute(_sql):
            return FakeCursor()

    class FakeDF:
        columns = ["n"]

        @staticmethod
        def collect():
            return [(120.0,)]

    problems = compare_bounded(
        None, FakeCon(), "fake", lambda s, d: FakeDF(), "SELECT 1", "", 0.1
    )
    assert problems and "bound" in problems[0]
