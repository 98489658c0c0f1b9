"""Driver-rotation ordering — the bounded per-round check budget must
land on the strongest-evidence-first order: last round's reds, then
queries new since the catalog snapshot, then the risk nudge, then
oracle-backed never-checked, then rows-only, greens last (ADVICE r3:
priority must be DERIVED from status files, not a stale hardcode)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from chicago_crime_spark_ml_spark.queries import ORACLE, QUERIES  # noqa: E402

# Ordering tests below assert RELATIVE order between two tiers. Either
# tier may legitimately be EMPTY in a terminal state (e.g. every
# oracle-backed query driver-green, or no new queries this round) —
# that is success, not a failure, so each test skips rather than
# asserting its precondition (ADVICE r4+r5: two consecutive rounds
# broke on "assumes unchecked work remains" preconditions).


def test_new_queries_jump_the_queue():
    # Greens self-demote even when snapshot-new (a new query driver-checked
    # green in the same round belongs at the back, not the front), so the
    # jump-the-queue contract only covers never-green, non-red new names.
    order = list(entry.queries())
    green = entry._previously_green()
    reds = entry._latest_reds()
    new = entry._new_since_snapshot(dict(QUERIES)) - green - reds
    plain = [
        n
        for n in order
        if n not in new and n not in green and n not in reds
        and n not in entry._STATS_TIER_NUDGE
    ]
    if not (new and plain):
        pytest.skip("terminal state: no new or no plain never-green names")
    worst_new = max(order.index(n) for n in new)
    first_plain = min(order.index(n) for n in plain)
    assert worst_new < first_plain


def test_greens_rotate_to_the_back():
    order = list(entry.queries())
    green = entry._previously_green()
    assert green, "rounds 1-3 produced green rows"
    nongreen = [n for n in order if n not in green]
    if not nongreen:
        pytest.skip("terminal state: every catalog query is driver-green")
    first_green = min(order.index(n) for n in green)
    last_nongreen = max(order.index(n) for n in nongreen)
    assert last_nongreen < first_green


def test_never_checked_oracle_backed_before_rows_only():
    order = list(entry.queries())
    green = entry._previously_green()
    rows_only = [
        n for n in order
        if n not in green and n not in ORACLE
    ]
    oracle_backed = [
        n for n in order
        if n not in green and n in ORACLE
    ]
    if not (rows_only and oracle_backed):
        pytest.skip("terminal state: a never-green tier is empty")
    assert max(order.index(n) for n in oracle_backed) < min(
        order.index(n) for n in rows_only
    )


def test_rewritten_greens_front_the_green_tier():
    # A green query rewritten this round outranks all other greens so the
    # driver re-certifies the CURRENT implementation (VERDICT r5 #2). Only
    # meaningful while the list is non-empty and its names are green.
    order = list(entry.queries())
    green = entry._previously_green()
    rewritten = [n for n in entry._REWRITTEN_GREENS if n in green]
    other_green = [
        n for n in order if n in green and n not in entry._REWRITTEN_GREENS
    ]
    if not (rewritten and other_green):
        pytest.skip("terminal state: no rewritten greens to front")
    assert max(order.index(n) for n in rewritten) < min(
        order.index(n) for n in other_green
    )


def test_rewritten_greens_names_exist():
    assert not [n for n in entry._REWRITTEN_GREENS if n not in QUERIES]


def test_latest_reds_derivation(tmp_path, monkeypatch):
    # a red row (hash_match false) in the most recent file is priority 0
    import glob as _glob
    import json

    r1 = tmp_path / "CORRECTNESS_r01.json"
    r2 = tmp_path / "CORRECTNESS_r02.json"
    r1.write_text(json.dumps({"a": {"hash_match": True}}))
    r2.write_text(
        json.dumps({"b": {"hash_match": False}, "c": {"hash_match": True}})
    )
    real_glob = _glob.glob
    monkeypatch.setattr(
        entry.glob,
        "glob",
        lambda pat: sorted(
            str(p) for p in tmp_path.glob("CORRECTNESS_r*.json")
        )
        if "CORRECTNESS" in pat
        else real_glob(pat),
    )
    assert entry._latest_reds() == {"b"}
    assert entry._previously_green() == {"a", "c"}


def test_stats_nudge_names_exist():
    # a typo in the nudge list silently no-ops; lock the names
    assert not [n for n in entry._STATS_TIER_NUDGE if n not in QUERIES]


def test_bench_contract_line_bounded():
    # the driver's tail capture is 2000 chars; bench must always end with
    # a parseable contract line that fits (r4 regression: one long line,
    # "parsed": null). Simulate both a normal and an oversized payload.
    import json

    import bench

    payload = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "unit": "sec",
        "queries": {f"q{i}": 0.123 for i in range(31)},
        "queries_min": {f"q{i}": 0.1 for i in range(31)},
        "drift": {"anchor": "r3", "ratio": 1.05},
        "sf": 0.1,
    }
    lines = bench.emit_lines(payload)
    last = json.loads(lines[-1])
    assert len(lines[-1]) <= 1800
    assert last["metric"] == "headline_queries_total" and "queries" in last
    assert "queries_min" not in last  # the fat key never rides the contract
    assert last["drift"] == {"anchor": "r3", "ratio": 1.05}  # r7: drift does
    # oversized: 200 long-named queries — the contract line must shed the
    # queries dict rather than overflow, and keep the small drift field
    payload["queries"] = {
        f"a_very_long_query_name_number_{i:04d}": 0.123 for i in range(200)
    }
    lines = bench.emit_lines(payload)
    last = json.loads(lines[-1])
    assert len(lines[-1]) <= 1800 and "queries" not in last
    assert last["value"] == 1.0 and "drift" in last
    # drift=None (non-sf0.1 runs) is omitted, not emitted as null
    payload["drift"] = None
    payload["queries"] = {"q": 0.1}
    last = json.loads(bench.emit_lines(payload)[-1])
    assert "drift" not in last


def test_bench_drift_computation():
    import bench

    cur = dict(bench._SENTINEL_ANCHOR_R03)
    assert bench._drift(cur, 0.1)["ratio"] == 1.0  # identical -> 1.0
    up = {k: v * 1.2 for k, v in cur.items()}
    assert bench._drift(up, 0.1)["ratio"] == pytest.approx(1.2, abs=0.001)
    assert bench._drift(cur, 0.01) is None  # anchor is sf0.1-only
    assert bench._drift({}, 0.1) is None
