"""Scale the driver testdata ~10× (sf0.1 → sf1, ~170 MB) for local
scale-stress benching — VERDICT r3 item 6: 100 TB claims should rest on
measured scaling ratios, not plan audits alone.

Replication strategy (all pure DataFrame ops, no Python row loops):

- Facts and entity dims (customer/supplier/part/orders/lineitem/events/
  documents/embeddings) are unioned 10× with every key column shifted by
  copy*stride, preserving referential integrity copy-by-copy (a copy's
  orders reference that copy's customers, etc.) and leaving per-key
  group sizes unchanged — so per-key operator outputs scale linearly,
  which is exactly the property the ratio bench asserts.
- region/nation stay fixed: real dims don't grow with fact volume, and
  keeping them dim-sized preserves the broadcast-join plans under test.
- documents.text gets a copy-specific marker token injected after every
  5th word (one JVM regexp_replace): within a copy the same positions
  get the same token, so planted near-dup pairs survive per copy (pair
  counts scale ~10×), while cross-copy trigram Jaccard drops to ~0.2 —
  far below the 0.8 near-dup threshold — so copies don't near-dup-match
  each other and the dedup workload scales linearly instead of
  quadratically. Copy 0 is byte-identical to the source.
- embeddings.embedding is rotated by `copy` positions (np.roll as an
  array slice+concat). Rotation is orthogonal: within-copy cosines are
  EXACTLY preserved (near-dup pair structure replicates linearly), while
  a generic vector is ~uncorrelated with its own rotation, so cross-copy
  cosine pairs don't appear.

Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir] [copies]
Defaults: /root/testdata/sf0.1  /root/repo/.localdata/sf1  10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from chicago_crime_spark_ml_spark import get_spark  # noqa: E402
from chicago_crime_spark_ml_spark.sources.io import load_table  # noqa: E402

STRIDES = {
    "c_custkey": 10_000_000,
    "o_custkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "s_suppkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "p_partkey": 10_000_000,
    "l_partkey": 10_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def replicate(df, copies: int, special=None):
    """Union `copies` shifted copies. Key columns get +copy*stride; the
    optional `special` hook maps (copy, colname, col) → expr for
    non-key transforms (text marker, vector rotation)."""
    parts = []
    for c in range(copies):
        cols = []
        for name, dtype in df.dtypes:
            col = F.col(name)
            if special is not None:
                out = special(c, name, col)
                if out is not None:
                    cols.append(out.alias(name))
                    continue
            if name in STRIDES and c > 0:
                cols.append(
                    (col + F.lit(c * STRIDES[name])).cast(dtype).alias(name)
                )
            else:
                cols.append(col.alias(name))
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen-sf1")

    def doc_special(c, name, col):
        if name == "text" and c > 0:
            # inject 'cpN' after every 5th word — one codegen'd regex,
            # same positions/token for every doc in the copy
            return F.regexp_replace(
                col, r"((?:\S+\s+){5})", r"$1cp" + str(c) + " "
            )
        if name == "n_chars" and c > 0:
            return F.length(
                F.regexp_replace(
                    F.col("text"), r"((?:\S+\s+){5})", r"$1cp" + str(c) + " "
                )
            ).cast("bigint")
        return None

    def emb_special(c, name, col):
        if name == "embedding" and c > 0:
            sz = F.size(col)
            return F.concat(
                F.slice(col, c + 1, sz - c), F.slice(col, 1, c)
            )
        return None

    plans = {
        "region": lambda df: df,
        "nation": lambda df: df,
        "customer": lambda df: replicate(df, copies),
        "supplier": lambda df: replicate(df, copies),
        "part": lambda df: replicate(df, copies),
        "orders": lambda df: replicate(df, copies),
        "lineitem": lambda df: replicate(df, copies),
        "events": lambda df: replicate(df, copies),
        "documents": lambda df: replicate(df, copies, doc_special),
        "embeddings": lambda df: replicate(df, copies, emb_special),
    }
    # Files per table: real 100 TB tables arrive as MANY splits, so the
    # stress data must too — a single-file/single-row-group table caps
    # every scan stage at one task regardless of spark.sql.files.
    # maxPartitionBytes (a row group is indivisible), which measured as
    # a phantom x5-x10 "superlinear" band across the whole catalog in
    # the first r5 sweep (the map stages serialized on 1-2 cores).
    width = {
        "region": 1,
        "nation": 1,
        "supplier": 2,
        "customer": 4,
        "part": 4,
        "orders": 8,
        "events": 8,
        "documents": 8,
        "embeddings": 8,
        "lineitem": 16,
    }
    os.makedirs(dst, exist_ok=True)
    for t, fn in plans.items():
        df = fn(load_table(spark, src, t))
        path = os.path.join(dst, f"{t}.parquet")
        df.repartition(width[t]).write.mode("overwrite").parquet(path)
        print(f"{t}: {spark.read.parquet(path).count()} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
