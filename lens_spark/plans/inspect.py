"""Physical-plan inspection and assertions.

"After each operator works, .explain the plan and iterate until it's the
plan you'd want." These helpers make plan properties *testable* so
regressions in pushdown/pruning/exchange placement fail CI instead of
silently costing a fortune at 100 TB (tests/test_plans.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._sc._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanStats:
    exchanges: int          # shuffle boundaries
    python_stages: int      # Arrow/pandas UDF evaluations
    scans: int              # file source scans
    codegen_spans: int      # whole-stage codegen regions
    pushed_filters: list    # filters reaching the parquet scan
    read_schemas: list      # pruned scan schemas


def plan_stats(df: DataFrame) -> PlanStats:
    # count numbered operator headers ("(4) Exchange") so tree + detail
    # sections of the formatted output aren't double-counted
    txt = formatted_plan(df)
    heads = re.findall(r"^\(\d+\) (\w[\w ]*)", txt, re.M)
    def n(*names):
        return sum(1 for h in heads if h.split()[0] in names)
    return PlanStats(
        exchanges=n("Exchange"),
        python_stages=n("ArrowEvalPython", "MapInPandas",
                        "FlatMapGroupsInPandas"),
        scans=n("Scan"),
        codegen_spans=len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                                         executed_plan(df)))),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", txt),
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", txt),
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert some filter fragment reached the scan (predicate pushdown)."""
    stats = plan_stats(df)
    joined = ";".join(stats.pushed_filters)
    assert fragment in joined, (
        f"filter '{fragment}' not pushed to scan; pushed: {joined!r}"
    )


def assert_pruned_schema(df: DataFrame, must_not_contain: str) -> None:
    """Assert column pruning dropped a column from every scan."""
    stats = plan_stats(df)
    for rs in stats.read_schemas:
        assert must_not_contain not in rs, (
            f"scan reads '{must_not_contain}' — column pruning failed: {rs}"
        )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    stats = plan_stats(df)
    assert stats.exchanges <= n, (
        f"plan has {stats.exchanges} exchanges, budget {n}:\n"
        + formatted_plan(df)[:2000]
    )
