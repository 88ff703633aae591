"""Physical-plan audit: the scale-critical plan properties as checkable
predicates, plus a CLI that prints the formatted plan and an audit line
for any registry query.

The properties (SURVEY.md §4 / the 100 TB story):

- filters pushed to the parquet scan, columns pruned;
- dimension joins broadcast (never SortMergeJoin on a dim);
- top-k as TakeOrderedAndProject (per-partition heaps, no global sort);
- grouped aggregates partially aggregated map-side;
- no row-at-a-time Python (``BatchEvalPython``) in any hot path —
  Arrow (``ArrowEvalPython`` / ``FlatMapGroupsInPandas``) only where the
  operator is deliberately a Pandas boundary;
- no single-partition Exchange (a global window smell).

Usage:
    python -m real_time_iot_data_pipeline_project_spark.plans.inspect q04_star_join
    python -m real_time_iot_data_pipeline_project_spark.plans.inspect q44_daytime_flag /root/testdata/sf0.01
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Executed-plan text (AQE: pre-execution final-plan candidate)."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame) -> dict[str, bool]:
    """Boolean audit of the scale-critical plan properties."""
    plan = plan_string(df)
    return {
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "broadcast_join": "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "take_ordered_topk": "TakeOrderedAndProject" in plan,
        "partial_agg": "partial_" in plan,
        "python_row_udf": "BatchEvalPython" in plan,
        "arrow_boundary": "ArrowEvalPython" in plan or "InPandas" in plan,
        "single_partition_exchange": "SinglePartition" in plan,
        # SinglePartition fed by map-side partial aggregation moves one
        # pre-aggregated row per upstream partition — inherent to any
        # GLOBAL aggregate, harmless at any scale. The smell is a
        # SinglePartition with NO partial agg above it (e.g. a global
        # window/row_number): full data through one task.
        "single_partition_full_data": "SinglePartition" in plan and "partial_" not in plan,
        "whole_stage_codegen": "*(1)" in plan or "WholeStageCodegen" in plan,
    }


def main(argv: list[str]) -> int:
    import os
    import sys

    sys.path.insert(0, os.getcwd())
    from real_time_iot_data_pipeline_project_spark import registry
    from real_time_iot_data_pipeline_project_spark.session import get_spark

    if not argv or argv[0] not in registry.QUERIES:
        names = ", ".join(sorted(registry.QUERIES))
        print(f"usage: inspect <query> [sf_dir]\nqueries: {names}")
        return 2
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-inspect")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.QUERIES[name](spark, sf_dir)
    df.explain("formatted")
    print(f"\n== audit: {name} ==")
    for k, v in audit(df).items():
        print(f"  {k}: {v}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main(sys.argv[1:]))
