"""SCD type-2 merge: versioned dimension history as one set-based pass.

The reference's DML surface stops at INSERT/DELETE/UPDATE over flat tables
(qurious/src/planner/sql.rs DML planning; UPDATE itself is refused
upstream). A warehouse-grade dimension needs slowly-changing-dimension
type-2 semantics on top: applying a batch of updates CLOSES the current
version of each changed row (stamps ``valid_to``) and INSERTS a new open
version, leaving history immutable. Lakehouse engines ship this as a
double-MERGE recipe; here it is a single declarative pass.

Scale shape: ONE equi-join of the current slice against the update batch on
the business key (broadcast when the batch is small), change detection as a
null-safe column comparison, and a unionByName of four disjoint slices
(history / unchanged-current / closed / new-versions). No window, no
per-row loop, no driver-side state; the history slice streams through
untouched. At 100 TB the cost is the one key-shuffle (or map-side broadcast
probe) over the CURRENT slice only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply ``updates`` (one row per business key: ``key_col`` +
    ``attr_cols``) to an SCD2 dimension ``dim`` whose schema is
    ``key_col, *attr_cols, valid_from, valid_to, current_col``.

    - changed keys: the open version is closed (``valid_to = batch_ts``,
      ``current_col = false``) and a new open version is inserted with
      ``valid_from = batch_ts``;
    - brand-new keys: inserted as open versions;
    - unchanged keys and closed history rows: pass through untouched.

    ``batch_ts`` is the effective-date literal (e.g. ``'2024-01-01'``) —
    passed explicitly so runs are deterministic and idempotent: re-applying
    the same batch changes nothing (attr comparison is null-safe, so NULL
    attribute values neither always-match nor always-differ).

    Precondition (validated): ``updates`` carries at most one row per key.
    """
    attr_cols = list(attr_cols)
    out_cols = [key_col, *attr_cols, valid_from, valid_to, current_col]
    ts = F.to_timestamp(F.lit(batch_ts))

    upd = updates.select(
        F.col(key_col).alias("__k"),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
    )
    # fail fast on a key with two update rows — SCD2 has no defined order
    # for same-batch versions (same rule DuckDB/Delta MERGE enforce) — and
    # on a NULL update key, which the equi-join below could never match
    # (one job covers both checks)
    bad = (
        upd.groupBy("__k")
        .count()
        .filter((F.col("count") > 1) | F.col("__k").isNull())
        .limit(1)
        .collect()
    )
    if bad:
        if bad[0]["__k"] is None:
            raise ValueError(
                "updates carry a NULL business key; SCD2 updates must "
                "identify the row they version"
            )
        raise ValueError(
            f"updates carry more than one row for key {bad[0]['__k']!r}; "
            "SCD2 batches must be unique per business key"
        )

    hist = dim.filter(~F.col(current_col))
    cur_all = dim.filter(F.col(current_col))
    # a NULL-key open version can never match an update (equi-join skips
    # NULLs) — pass it through unchanged instead of silently dropping it
    # (round-5 advisor finding: the isNotNull slice tests routed it nowhere)
    cur_null = cur_all.filter(F.col(key_col).isNull()).select(out_cols)
    cur = cur_all.filter(F.col(key_col).isNotNull())

    joined = cur.join(upd, cur[key_col] == upd["__k"], "full_outer")
    # null-safe any-attribute-differs (NULL attr == NULL attr is "same")
    changed = ~F.expr(
        " AND ".join(f"({c} <=> __u_{c})" for c in attr_cols) or "TRUE"
    )
    in_upd = F.col("__k").isNotNull()
    in_cur = F.col(key_col).isNotNull()

    unchanged_cur = joined.filter(in_cur & (~in_upd | ~changed)).select(out_cols)
    closed = joined.filter(in_cur & in_upd & changed).select(
        key_col,
        *attr_cols,
        valid_from,
        ts.alias(valid_to),
        F.lit(False).alias(current_col),
    )
    new_versions = joined.filter(in_upd & (~in_cur | changed)).select(
        F.col("__k").alias(key_col),
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        ts.alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_col),
    )
    return (
        hist.select(out_cols)
        .unionByName(cur_null)
        .unionByName(unchanged_cur)
        .unionByName(closed)
        .unionByName(new_versions)
    )


def scd2_snapshot(
    dim: DataFrame,
    as_of: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: the version of each row valid at ``as_of``
    (``valid_from <= as_of < valid_to``, open versions have NULL
    ``valid_to``). A pure filter — no join, no window."""
    ts = F.to_timestamp(F.lit(as_of))
    return dim.filter(
        (F.col(valid_from) <= ts)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > ts))
    )
