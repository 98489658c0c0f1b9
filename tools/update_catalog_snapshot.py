"""Regenerate tools/catalog_snapshot.json from the live catalog.

Run at the END of a round (after all new queries are registered): next
round, any newly-registered query is detected as catalog-minus-snapshot
and jumps the driver rotation queue in __spark_entry__.py — no hardcoded
priority list to go stale (ADVICE r3)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from chicago_crime_spark_ml_spark.queries import QUERIES  # noqa: E402

path = os.path.join(os.path.dirname(__file__), "catalog_snapshot.json")
with open(path, "w") as f:
    json.dump(
        {
            "comment": (
                "Query-catalog names as of the END of the previous round. "
                "Regenerated each round (tools/update_catalog_snapshot.py); "
                "names in the live catalog but absent here are NEW this "
                "round and jump the driver rotation queue."
            ),
            "names": sorted(QUERIES),
        },
        f,
        indent=1,
    )
print(f"wrote {len(QUERIES)} names to {path}")
