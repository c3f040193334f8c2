"""Deterministic train/val/test splitting by content-stable hash.

A training pipeline must assign every document to exactly one split, and the
assignment must be (a) deterministic across runs and engines, (b) stable
under repartitioning, (c) driftless as the corpus grows (adding documents
never moves an existing one between splits). Hashing the document key and
thresholding the digest gives all three; ``rand()`` gives none.

Greenfield operator (no reference counterpart); Spark-first design notes:

- the split label is a pure projection over ``md5`` — no shuffle, no state,
  no Python; at 100 TB this is a map-only pass;
- thresholds compare the first two hex characters lexicographically, which
  both Spark and DuckDB evaluate identically (the oracle replicates the
  exact expression), sidestepping engine-specific hash functions;
- granularity is 1/256 per threshold step — fine for corpus-scale splits
  (a 0.4% quantization worst case), and the same technique extends to more
  hex chars when finer fractions are needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative byte thresholds: [(label, upper_hex_exclusive), ...] with
    the last label catching the remainder."""
    if any(w < 0 for w in weights.values()):
        bad = [k for k, w in weights.items() if w < 0]
        raise ValueError(f"negative weight for {bad[0]!r}")
    # zero-weight labels get NO keys (not the ~1/256 remainder a naive
    # cumulative loop would hand a zero-weight final label)
    items = [(k, w) for k, w in weights.items() if w > 0]
    total = sum(w for _, w in items)
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    out, cum = [], 0.0
    for label, w in items[:-1]:
        cum += w / total
        out.append((label, format(min(int(cum * 256), 255), "02x")))
    out.append((items[-1][0], "zz"))  # remainder: above any 2-hex-char prefix
    return out


def split_assignment(
    key: Column, weights: dict[str, float] | None = None
) -> Column:
    """Split label for ``key`` (any type; cast to string before hashing).

    Default weights: train 0.80 / val 0.10 / test 0.10. The first byte of
    ``md5(key)`` is compared against cumulative thresholds, so a document's
    split depends only on its own key.
    """
    weights = weights or {"train": 0.80, "val": 0.10, "test": 0.10}
    b = F.substring(F.md5(key.cast("string")), 1, 2)
    branches = _thresholds(weights)
    col = F.when(b < F.lit(branches[0][1]), F.lit(branches[0][0]))
    for label, upper in branches[1:-1]:
        col = col.when(b < F.lit(upper), F.lit(label))
    return col.otherwise(F.lit(branches[-1][0]))


def split_assignment_sql(key_sql: str, weights: dict[str, float] | None = None) -> str:
    """ANSI/DuckDB replica of :func:`split_assignment` for oracle checks."""
    weights = weights or {"train": 0.80, "val": 0.10, "test": 0.10}
    branches = _thresholds(weights)
    b = f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, 2)"
    case = "CASE "
    for label, upper in branches[:-1]:
        case += f"WHEN {b} < '{upper}' THEN '{label}' "
    case += f"ELSE '{branches[-1][0]}' END"
    return case


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split-label column keyed on ``key_col``."""
    return df.withColumn(out_col, split_assignment(F.col(key_col), weights))
