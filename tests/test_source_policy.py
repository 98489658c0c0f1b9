"""Source-level policy locks (VERDICT r3 item 4): no persist() without a
release path anywhere in the package. Query builders return lazy frames,
so they have no post-action point to unpersist at — they must use eager
localCheckpoint (no cache-registry entry) instead; operators may persist
only if the same function unpersists."""

from __future__ import annotations

import os

PKG = os.path.join(
    os.path.dirname(__file__), "..", "chicago_crime_spark_ml_spark"
)


def _sources():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                path = os.path.join(root, f)
                with open(path) as fh:
                    yield path, fh.read()


def test_queries_catalog_never_persists():
    with open(os.path.join(PKG, "queries.py")) as fh:
        src = fh.read()
    assert ".persist()" not in src, (
        "queries.py must materialize reused intermediates via eager "
        "localCheckpoint, not persist() — callers have no unpersist point"
    )


def test_any_persist_has_unpersist_in_same_file():
    for path, src in _sources():
        if ".persist(" in src:
            assert ".unpersist(" in src, (
                f"{path} persists without any unpersist — session-lifetime "
                "cache leak for library callers"
            )
