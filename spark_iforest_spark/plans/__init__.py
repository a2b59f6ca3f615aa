"""Physical-plan inspection helpers.

Used by the plan-quality tests (tests/test_plans.py) to assert the
properties that matter at 100 TB: filters/projections reach the parquet
scan, small sides broadcast, prediction stays in whole-stage codegen, and
Python only appears where it must (tree build + scoring).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    if not any(fragment in line for line in pushed):
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; PushedFilters lines: {pushed}\n{plan}"
        )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Column pruning: the parquet ReadSchema must not exceed `columns`."""
    plan = formatted_plan(df)
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        got = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        extra = got - columns
        if extra:
            raise AssertionError(f"scan reads unexpected columns {extra}\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join in plan\n{plan}")


def count_shuffles(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in formatted_plan(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Names of Python-evaluated physical nodes (ArrowEvalPython,
    FlatMapGroupsInPandas, MapInPandas, ...) — the slow path we budget."""
    plan = formatted_plan(df)
    return [
        name
        for name in (
            "ArrowEvalPython",
            "BatchEvalPython",
            "FlatMapGroupsInPandas",
            "MapInPandas",
            "FlatMapGroupsInPandasWithState",
        )
        if name in plan
    ]


def _tree_indent(line: str) -> int:
    """Depth of a node line in Spark's tree-drawing plan header (the chars
    before the operator name are drawn from ' :+-*')."""
    i = 0
    while i < len(line) and line[i] in " :+-*":
        i += 1
    return i


def assert_no_broadcast_of(df: DataFrame, fragment: str) -> None:
    """Assert no BroadcastExchange subtree contains a node matching
    ``fragment`` — i.e. the relation produced by that node is never the
    broadcast side of any join. The 100 TB guard for corpus-sized tables
    that must flow through shuffles, not driver/executor memory."""
    plan = formatted_plan(df)
    header = plan.split("\n\n")[0].splitlines()
    for idx, line in enumerate(header):
        if "BroadcastExchange" not in line:
            continue
        depth = _tree_indent(line)
        for sub in header[idx + 1:]:
            if _tree_indent(sub) <= depth:
                break
            if fragment in sub:
                raise AssertionError(
                    f"{fragment!r} feeds a BroadcastExchange — corpus-sized "
                    f"relation on the broadcast side\n{plan}"
                )
