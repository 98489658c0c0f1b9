"""Full-catalog scaling sweep: time EVERY registered query at two scale
factors and report the wall-clock ratio — the systematic form of the
round-4 sf1 spot-check that caught two superlinear MLlib pathologies
invisible at sf0.1-only benching.

A query reading 10× the data should cost ≲ ~5× on a fixed 32-core box
(some fixed overhead amortizes, some shuffles grow n·log n). Ratios well
above that flag an operator whose cost curve bends the wrong way —
exactly what breaks first at 100 TB regardless of how fast sf0.1 looks.

One cold run per query per scale (noop-forced, cache cleared between
queries): a single run is noisy for sub-second queries, so the report
also prints absolute times — only slow-AND-high-ratio rows matter.

Run: python tools/scale_sweep.py [small_sf_dir] [big_sf_dir] [out_json]
Defaults: /root/testdata/sf0.1  /root/repo/.localdata/sf1  (stdout only)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# By-design-superlinear certification queries, skipped (and logged) so a
# sweep doesn't spend 8+ minutes re-measuring a documented O(n²) oracle
# side: embedding_blocked_exact_parity's whole point is comparing the
# blocked path against a brute-force twin (501 s at sf1, ×16 — measured
# once in the r5 sweep and recorded in SCALE.md). The blocked production
# path itself IS swept, as embedding_near_dup_pairs.
SKIP = {
    "embedding_blocked_exact_parity": "brute-force parity twin, O(n^2 d)",
    # the agreement query runs recommendForAllUsers (the |U|·|I| MLlib
    # ground truth — its superlinear growth is already measured via
    # als_coverage_check) AND the blocked serving path; sweeping it
    # re-times the documented certification side, not a production plan
    "als_topk_serving_agreement": "MLlib full-catalog ground-truth side",
}


def sweep(sf_dir: str, names, spark) -> dict[str, float]:
    from chicago_crime_spark_ml_spark.queries import QUERIES

    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — a ledger, not a gate
            print(f"ERROR {name} at {sf_dir}: {e!r:.120}", flush=True)
            out[name] = float("nan")
        print(f"  {name}: {out[name]}s", flush=True)
    return out


def main(small: str, big: str, out_path: str | None) -> int:
    from chicago_crime_spark_ml_spark import get_spark
    from chicago_crime_spark_ml_spark.queries import QUERIES

    spark = get_spark("scale-sweep")
    names = [n for n in QUERIES if n not in SKIP]
    for n, why in SKIP.items():
        print(f"SKIPPED {n}: {why}", flush=True)
    print(f"== {small} ==", flush=True)
    t_small = sweep(small, names, spark)
    print(f"== {big} ==", flush=True)
    t_big = sweep(big, names, spark)

    rows = []
    for n in names:
        a, b = t_small.get(n), t_big.get(n)
        ratio = round(b / a, 2) if a and b == b and a == a else None
        rows.append({"query": n, "small_s": a, "big_s": b, "ratio": ratio})
    rows.sort(key=lambda r: -(r["ratio"] or 0))
    print("\nworst ratios (big/small wall-clock):")
    for r in rows[:25]:
        print(
            f"  {r['query']:45s} {r['small_s']:8}s -> {r['big_s']:8}s"
            f"  x{r['ratio']}"
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
            sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1",
            sys.argv[3] if len(sys.argv) > 3 else None,
        )
    )
