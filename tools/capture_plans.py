"""Capture .explain("formatted") output for named queries to plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" — file becomes plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<suffix>.txt
  (round dir defaults to r14)
  With no names, captures every bench.py HEADLINE query.

Analysis-only (no execution): the formatted plan is what the judge
checks optimization claims against. With AQE on, this is the initial
plan (isFinalPlan=false) — join-strategy/coalesce decisions made at
runtime are documented in the round report where they differ.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from chicago_crime_spark_ml_spark import get_spark
    from chicago_crime_spark_ml_spark.queries import QUERIES

    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered")
            continue
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
