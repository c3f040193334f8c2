"""Physical-plan inspection over ``df.explain`` output."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_facts(plan: str) -> dict:
    """One-glance facts from a physical-plan string."""
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "scans": plan.count("FileScan parquet"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "top_n": plan.count("TakeOrderedAndProject"),
    }


def explain_summary(df: DataFrame) -> dict:
    """One-glance plan facts: joins, shuffles, scans, codegen spans."""
    return plan_facts(_executed_plan(df))


def pushed_filters(df: DataFrame) -> list[str]:
    """DataFilters/PushedFilters reaching the parquet scans."""
    plan = _executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"(?:DataFilters|PushedFilters): \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column list of each parquet scan (column-pruning check)."""
    return scan_columns_from(_executed_plan(df))


def scan_columns_from(plan: str) -> list[list[str]]:
    return [
        [c.split("#")[0] for c in m.group(1).split(",")]
        for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan)
    ]


def shuffle_count(df: DataFrame) -> int:
    return explain_summary(df)["shuffles"]


def broadcast_join_count(df: DataFrame) -> int:
    return explain_summary(df)["broadcast_joins"]


def has_cartesian_product(df: DataFrame) -> bool:
    return explain_summary(df)["cartesian"] > 0
