"""Physical-plan introspection and assertions.

The scale discipline (SURVEY §4): after an operator is correct, its plan
must be the plan you'd want at 100 TB — filters reaching the parquet
scan, projections pruned to the read set, small dims broadcast, wide
spans of whole-stage codegen. These helpers turn that review into
assertions so regressions in plan shape fail tests, not production runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """Simple-mode physical plan: one line per operator (codegen stages
    marked with ``*(n)``), unlike formatted mode which repeats every
    operator in its details section."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if any parquet scan advertises a pushed filter on `column`."""
    plan = formatted_plan(df)
    return any(
        column in m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)

def uses_take_ordered(df: DataFrame) -> bool:
    """Top-k executed as TakeOrderedAndProject (no global sort)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen stages in the FINAL (post-AQE) plan.
    Triggers execution: codegen markers only exist once AQE finalizes."""
    # collect() THIS dataframe: count() would execute a different plan and
    # leave this one's AQE un-finalized (isFinalPlan=false, no markers)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (pre-AQE)."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobin|SinglePartition)", simple_plan(df)))
