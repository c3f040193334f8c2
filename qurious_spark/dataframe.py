"""Fluent DataFrame layer — reference entry points B and C.

The reference exposes a thin DataFrame API over its logical plans
(``DataFrame { planner, plan }`` with project/filter/aggregate/collect,
qurious/src/dataframe/mod.rs:15-59) and a programmatic ``LogicalPlanBuilder``
(scan/project/filter/having/join/aggregate/sort/limit/alias,
qurious/src/logical/builder.rs:21-120). Here both collapse into one wrapper
over the PySpark DataFrame: every method simply declares more of the logical
plan and Catalyst plans it — there is no separate builder to maintain.

Accepts SQL-string expressions (parsed with ``F.expr``) or PySpark Columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(e) -> Column:
    return F.expr(e) if isinstance(e, str) else e


class QFrame:
    """Fluent relational builder over a PySpark DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- reference DataFrame API (dataframe/mod.rs) --- #
    def project(self, *exprs) -> "QFrame":
        return QFrame(self.df.select(*[_col(e) for e in exprs]))

    def filter(self, pred) -> "QFrame":
        return QFrame(self.df.filter(_col(pred)))

    def aggregate(self, group_by: list, aggr: list) -> "QFrame":
        gb = [_col(e) for e in group_by]
        ag = [_col(e) for e in aggr]
        return QFrame(self.df.groupBy(*gb).agg(*ag)) if gb else QFrame(self.df.agg(*ag))

    def collect(self):
        return self.df.collect()

    # --- reference LogicalPlanBuilder API (logical/builder.rs) --- #
    def having(self, pred) -> "QFrame":
        return self.filter(pred)

    def sort(self, *exprs) -> "QFrame":
        return QFrame(self.df.orderBy(*[_col(e) for e in exprs]))

    def limit(self, fetch: int, skip: int = 0) -> "QFrame":
        df = self.df.offset(skip) if skip else self.df
        return QFrame(df.limit(fetch))

    def alias(self, name: str) -> "QFrame":
        return QFrame(self.df.alias(name))

    def join(self, right: "QFrame", how: str, on, filter=None) -> "QFrame":
        cond = _col(on)
        if filter is not None:
            cond = cond & _col(filter)
        how = {
            "inner": "inner",
            "left": "left",
            "right": "right",
            "full": "full",
            "left_semi": "left_semi",
            "left_anti": "left_anti",
        }[how]
        return QFrame(self.df.join(right.df, cond, how))

    def cross_join(self, right: "QFrame") -> "QFrame":
        return QFrame(self.df.crossJoin(right.df))

    def distinct(self) -> "QFrame":
        return QFrame(self.df.distinct())

    def union(self, other: "QFrame", all: bool = True) -> "QFrame":
        u = self.df.unionByName(other.df)
        return QFrame(u if all else u.distinct())

    # --- escapes --- #
    def to_spark(self) -> DataFrame:
        return self.df

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)
