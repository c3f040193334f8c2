"""Plan inspection utilities.

The reference hand-rolls its optimizer and tests plan shapes with golden
plan-string diffs (SURVEY.md §4.1, optimizer/rule tests); on Spark the
optimizer is Catalyst, so the equivalent discipline is asserting properties
of the *physical* plan: filters pushed into scans, columns pruned, small
sides broadcast, no accidental cartesian products, bounded shuffle counts.
Used by tests/test_plans.py to keep plans honest as the engine evolves.
"""

from qurious_spark.plans.inspect import (
    broadcast_join_count,
    explain_summary,
    has_cartesian_product,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "explain_summary",
    "has_cartesian_product",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
]
