"""Headline-query profiler for the optimization rounds: splits each
query's wall-clock into (a) driver-side DataFrame construction (Py4J
plan building), and (b) noop-forced execution, over N runs.

Usage: python tools/opt_profile.py [runs] [name ...]
Writes one JSON line per query to stdout; same methodology as bench.py
(noop sink, cache cleared between runs, median reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from chicago_crime_spark_ml_spark import get_spark
    from chicago_crime_spark_ml_spark.queries import QUERIES

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("opt-profile")
    # same warm-up as bench.py
    QUERIES["flagship_regional_revenue"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in names:
        build_ts, exec_ts = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
            spark.catalog.clearCache()
        build_ts.sort()
        exec_ts.sort()
        med = runs // 2
        rec = {
            "build": round(build_ts[med], 3),
            "exec": round(exec_ts[med], 3),
            "exec_min": round(exec_ts[0], 3),
        }
        out[name] = rec
        print(json.dumps({"name": name, **rec}), flush=True)
    total_b = round(sum(v["build"] for v in out.values()), 3)
    total_e = round(sum(v["exec"] for v in out.values()), 3)
    print(json.dumps({"total_build": total_b, "total_exec": total_e}))


if __name__ == "__main__":
    main()
