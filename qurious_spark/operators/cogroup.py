"""Cogrouped-map pandas surface: per-key alignment of two DataFrames.

Completes the engine's pandas-API coverage (scalar pandas_udf, grouped-agg
UDAF, grouped-map, mapInPandas are all exposed elsewhere): ``cogroup().
applyInPandas`` hands BOTH sides' rows for one key to a Python function as
two pandas DataFrames — the escape hatch for per-key logic that genuinely
needs both sides materialized (alignment, per-key model fitting, custom
reconciliation).

Scale shape: one shuffle per side on the key; each task sees one key group
(Arrow-batched). Skewed keys bound the task size — same caveat as any
per-key grouped-map; salt upstream if a single key's group exceeds memory.

The flagship use is ``asof_align``: per-key pandas ``merge_asof``. The JVM
implementation (operators/asof.py, union + running window) is the scale
path; this one exists for API parity and as an independent implementation
the tests CROSS-CHECK against the JVM one — two fundamentally different
algorithms agreeing on every row is strong evidence both are correct.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

import pandas as pd


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    on: str,
    fn: Callable[["pd.DataFrame", "pd.DataFrame"], "pd.DataFrame"],
    schema,
) -> DataFrame:
    """Group both sides by ``on`` and apply ``fn(left_pdf, right_pdf)`` per
    key (either side may be empty for a key present only in the other)."""
    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(fn, schema)


def asof_align(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Per-key pandas ``merge_asof`` (inclusive): each left row gets the
    latest right payload at-or-before (``backward``) or the earliest
    at-or-after (``forward``) its timestamp — same semantics and tiebreaks
    as operators/asof.asof_join, with payload columns prefixed
    ``asof_``."""
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]
    out_schema = left.schema
    from pyspark.sql.types import StructType

    fields = list(out_schema.fields)
    for c in right_payload:
        f = right.schema[c]
        fields.append(type(f)(f"asof_{c}", f.dataType, True))
    out_schema = StructType(fields)
    lcols = list(left.columns)

    out_cols = [f.name for f in out_schema.fields]

    def fn(lpdf: "pd.DataFrame", rpdf: "pd.DataFrame") -> "pd.DataFrame":
        if lpdf.empty:
            return pd.DataFrame(columns=out_cols)
        if rpdf.empty:
            out = lpdf.copy()
            for c in right_payload:
                out[f"asof_{c}"] = None
            return out[out_cols]
        r = rpdf[[right_ts, *right_payload]].rename(
            columns={c: f"asof_{c}" for c in right_payload}
        )
        # merge_asof needs sorted inputs; among equal-time right rows pandas
        # keeps the LAST, so ascending payload sort = latest-payload wins
        # (matches the JVM tiebreak in operators/asof.py)
        sort_keys = [right_ts] + (
            [f"asof_{right_payload[0]}"] if right_payload else []
        )
        r = r.sort_values(sort_keys).rename(columns={right_ts: "__rt"})
        merged = pd.merge_asof(
            lpdf.sort_values(left_ts),
            r,
            left_on=left_ts,
            right_on="__rt",
            direction=direction,
            allow_exact_matches=True,
        )
        return merged[out_cols]

    return cogroup_apply(left, right, on, fn, out_schema)
