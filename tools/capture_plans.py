"""Capture `.explain("formatted")` for registry queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan-diff
evidence (guide §1: measure first; the judge checks plan claims
against these files).

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [...]
       (run from the repo checkout whose plans you want — a worktree
       at the pre-optimization commit for `_before`, the working tree
       for `_after`)
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from real_time_iot_data_pipeline_project_spark import registry  # noqa: E402
from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
