"""Physical-plan audits: verify that the plans Catalyst produces are the
plans we want at 100 TB — filters pushed to the parquet scan, partition
pruning on the bucket directory, no row-at-a-time Python in whole-stage
codegen spans. Used by tests and available interactively:

    from excelastic_spark.plans.audit import explain_str, assert_pushed_filters
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear in the scan's PushedFilters list."""
    plan = explain_str(df)
    assert "PushedFilters" in plan, plan
    for frag in fragments:
        assert frag in plan, f"{frag!r} not pushed:\n{plan}"


def assert_partition_pruned(df: DataFrame, col: str) -> None:
    """The scan must carry a PartitionFilters entry on ``col`` (bucket
    pruning on term lookups)."""
    plan = explain_str(df)
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert col in seg, f"no partition filter on {col}:\n{plan}"


def assert_no_python_row_udf(df: DataFrame) -> None:
    """BatchEvalPython = row-at-a-time Python UDF (the slow path); our
    plans may contain ArrowEval / mapInPandas nodes only."""
    plan = explain_str(df, "extended")
    assert "BatchEvalPython" not in plan, plan
