"""Cold interleaved A/B bench (VERDICT r11 item 6): settle whether the
~1.07-1.14x shared-set drift between round records is a real code
regression or machine wobble.

Protocol: check out the comparison tree (e.g. the round-10 endpoint)
into a git worktree, then alternate FRESH-JVM runs of the drifting
query family between the two trees in one measurement session:

  for round in 1..N:            # interleaved, same machine state
      run_tree(HEAD)            # fresh process, fresh SparkSession
      run_tree(worktree)

Each process warms codegen (one throwaway run per query), then times
two reps per query; the session-level statistic is the MIN per
(tree, query) across all rounds x reps — pairing identical machine
conditions so a real plan/code regression shows as a stable gap while
load wobble cancels.

Usage:
  python tools/ab_bench.py <tree_path> <q1,q2,...> [sf_dir]
prints ONE JSON line {"tree":..., "times": {q: [rep1, rep2], ...}}.
The driver loop lives in the round notes / BENCH.md entry.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    queries = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.path.insert(0, tree)
    os.chdir(tree)  # scratch-relative paths stay inside the tree's view

    from real_time_iot_data_pipeline_project_spark import registry
    from real_time_iot_data_pipeline_project_spark.session import get_spark

    spark = get_spark(app_name="ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # absorb first-run codegen/session costs before any timed rep
    for q in queries:
        registry.QUERIES[q](spark, sf_dir).count()
    times: dict[str, list[float]] = {}
    for q in queries:
        reps = []
        for _ in range(2):
            t0 = time.monotonic()
            registry.QUERIES[q](spark, sf_dir).count()
            reps.append(round(time.monotonic() - t0, 3))
        times[q] = reps
    print(json.dumps({"tree": tree, "times": times}), flush=True)


if __name__ == "__main__":
    main()
