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


def _single_partition_full_data(plan: str) -> bool:
    """True iff SOME Exchange SinglePartition node's input is NOT a
    partial aggregate — i.e. full rows funnel through one task.

    Scoped per node (not whole-plan substring co-occurrence): each
    ``Exchange SinglePartition`` line is checked against its immediate
    child lines in the tree text, so a global-window SinglePartition is
    flagged even when an unrelated partial agg exists elsewhere in a
    multi-operator plan. A SinglePartition fed by map-side partial
    aggregation moves one pre-aggregated row per upstream partition —
    inherent to any GLOBAL aggregate, harmless at any scale."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line or "ReusedExchange" in line:
            continue
        # the Exchange's input subtree root is exactly the next line in
        # the tree text (deeper nodes must not vouch for the exchange)
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "partial_" not in child:
            return True
    return False


def _scan_pushdown_counts(plan: str) -> tuple[int, int]:
    """(scans with non-empty PushedFilters, total scans advertising
    PushedFilters) — per-scan, so one filterless dim scan doesn't mask
    a pushed fact filter."""
    total = pushed = 0
    for chunk in plan.split("PushedFilters: ")[1:]:
        total += 1
        if not chunk.startswith("[]"):
            pushed += 1
    return pushed, total


def audit(df: DataFrame) -> dict[str, bool]:
    """Boolean audit of the scale-critical plan properties. Node-scoped
    where it matters (SinglePartition, scan pushdown); substring checks
    where presence/absence anywhere is the property (Python UDFs)."""
    plan = plan_string(df)
    pushed, total_scans = _scan_pushdown_counts(plan)
    return {
        # at least one scan pushes a filter (dims legitimately scan
        # unfiltered; see pushed_filters_all_scans for the strict form)
        "pushed_filters": pushed > 0,
        "pushed_filters_all_scans": total_scans > 0 and pushed == total_scans,
        "broadcast_join": "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "take_ordered_topk": "TakeOrderedAndProject" in plan,
        "partial_agg": "partial_" in plan,
        "python_row_udf": "BatchEvalPython" in plan,
        "arrow_boundary": "ArrowEvalPython" in plan or "InPandas" in plan,
        "single_partition_exchange": "SinglePartition" in plan,
        "single_partition_full_data": _single_partition_full_data(plan),
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
