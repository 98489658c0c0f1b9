"""Physical-plan inspection helpers.

The engine's scale guarantees are properties of the PLAN, not the code:
small-dim joins must be BroadcastHashJoin, filters must reach the parquet
scan as PushedFilters, hot paths must stay inside WholeStageCodegen.
These helpers make those properties assertable in tests (SURVEY.md §4:
"assert via df.explain() in tests").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() text as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert the plan broadcasts at least one join side — the contract of
    add_group_count_feature and every dim join at 100 TB (a sort-merge
    join against a 25-row dim is a full shuffle of the fact table)."""
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join in plan:\n{plan}"
    )


def assert_no_shuffle(df: DataFrame) -> None:
    """Assert the plan contains no exchange — for map-only pipelines
    (per-row feature engineering must never shuffle)."""
    plan = explain_str(df, "simple")
    assert "Exchange" not in plan, f"unexpected shuffle in plan:\n{plan}"


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters: [...])."""
    plan = explain_str(df, "formatted")
    assert "PushedFilters" in plan and fragment in plan, (
        f"filter '{fragment}' not pushed to scan:\n{plan}"
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (fewer breaks
    out of generated code)."""
    return explain_str(df, "simple").count("WholeStageCodegen")


def observe_metrics(df: DataFrame, name: str, **aggs) -> tuple[DataFrame, "Observation"]:
    """Attach zero-extra-pass metrics to a plan via ``df.observe``: the
    aggregates are computed DURING the action that consumes ``df`` (no
    second scan, unlike calling .count() for logging — the reference's
    per-step count() anti-pattern re-executed the whole plan each time,
    SURVEY §4). Returns (instrumented_df, observation); read
    ``observation.get`` after the action completes. Works identically
    under batch and foreachBatch streaming."""
    from pyspark.sql import Observation  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    obs = Observation(name)
    exprs = [expr.alias(alias) for alias, expr in aggs.items()] or [
        F.count(F.lit(1)).alias("rows")
    ]
    return df.observe(obs, *exprs), obs


def assert_runtime_bloom_filter(df: DataFrame) -> None:
    """Assert Catalyst injected a runtime bloom filter into the plan:
    the probe side carries ``might_contain(...)`` fed by a
    ``bloom_filter_agg`` built from the selective build side. This is
    Spark's InjectRuntimeFilter at work — the idiomatic answer to
    "bloom-prune the fact scan before a shuffle join" (no hand-rolled
    bloom filter needed). At 100 TB it fires with stock thresholds
    (probe scan ≥ 10 GB); tests shrink
    spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold
    to 0 to exercise the same plan shape at test scale."""
    plan = explain_str(df, "simple")
    assert "might_contain" in plan and "bloom_filter_agg" in plan, (
        f"no runtime bloom filter in plan:\n{plan}"
    )
