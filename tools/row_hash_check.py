"""Result-identity harness for the optimization rounds.

Computes one order-independent fingerprint per query (xxhash64 of every
cell, summed over rows — commutative, so row order can't matter) at a
given SF dir, and writes/compares a JSON snapshot. Used to prove a
plan-level rewrite changed NOTHING about what a query computes:

  python tools/row_hash_check.py snap /tmp/before.json q1 q2 ...
  ... edit code ...
  python tools/row_hash_check.py check /tmp/before.json q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def fingerprint(df) -> dict:
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    # stringify every cell first: a stable, type-agnostic canonical form
    # (floats keep full repr; the queries already round for the oracle)
    cells = [F.coalesce(F.col(c).cast("string"), F.lit("\0null")) for c in cols]
    row = df.select(
        F.xxhash64(*cells).cast("decimal(38,0)").alias("h"),
        F.lit(1).alias("one"),
    )
    agg = row.groupBy().agg(
        F.sum("h").alias("hsum"), F.count("one").alias("n")
    ).collect()[0]
    return {"hsum": str(agg["hsum"] or 0), "n": int(agg["n"]), "cols": cols}


def main() -> None:
    from chicago_crime_spark_ml_spark import get_spark
    from chicago_crime_spark_ml_spark.queries import QUERIES

    mode, path, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    spark = get_spark("row-hash-check")
    out = {}
    for name in names:
        out[name] = fingerprint(QUERIES[name](spark, SF_DIR))
        print(f"{name}: {out[name]}", flush=True)
    if mode == "snap":
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"snapshot -> {path}")
        return
    with open(path) as f:
        ref = json.load(f)
    bad = [n for n in names if ref.get(n) != out[n]]
    if bad:
        print(f"MISMATCH: {bad}")
        sys.exit(1)
    print("IDENTICAL: all queries match the snapshot")


if __name__ == "__main__":
    main()
