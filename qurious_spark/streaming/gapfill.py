"""Streaming gapfill/LOCF: the streaming face of operators/timeseries.py.

A TimescaleDB-style ``time_bucket_gapfill + locf`` as a custom stateful
streaming operator (``applyInPandasWithState``): per key, the state holds
the observed bucket→sum map over a bounded retention horizon; each
micro-batch merges its events in and re-emits the filled series in update
mode. Re-emission is idempotent and versioned, so the operator is correct
under ANY micro-batch split of the input — including files arriving out of
event-time order — as long as late data is younger than the retention
horizon (the watermark analogue; older events are dropped exactly like a
watermarked aggregation would drop them).

Scale shape: state is per-key and bounded (``max_buckets`` entries), keys
are hash-partitioned across executors by the groupBy, and the Python
function is Arrow-batched. The per-batch emission is O(series length) per
key — production would emit only the changed suffix; the full re-emit keeps
the operator's contract trivially checkable against the batch
``resample(..., fill="ffill")`` oracle (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("bucket", LongType()),
        StructField("v_filled", DoubleType()),
        StructField("observed", BooleanType()),
        StructField("version", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType())),
        StructField("sums", ArrayType(DoubleType())),
        StructField("version", LongType()),
        # buckets below this were evicted; late data under it is dropped
        # (None until the first eviction — nothing is dropped before that)
        StructField("evicted_below", LongType()),
    ]
)


def _epoch_seconds(ts: pd.Series) -> pd.Series:
    """Dtype-agnostic (ns/us, tz-naive) timestamp → epoch seconds."""
    return (pd.to_datetime(ts) - pd.Timestamp(0)) // pd.Timedelta(seconds=1)


def locf_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    step_seconds: int = 3600,
    max_buckets: int = 1024,
) -> DataFrame:
    """Per-key bucketed sums with gap buckets carried forward (LOCF),
    emitted in update mode. Output: (key, bucket, v_filled, observed,
    version) — ``version`` increments per state update so a sink can keep
    the latest emission per (key, bucket)."""
    step = int(step_seconds)
    if step <= 0:
        raise ValueError("step_seconds must be positive")

    # Epoch derivation must be zone-independent (r12 TZ gate): an LTZ ts
    # reaches the Arrow UDF as SESSION-zone wall time, so computing epochs
    # from it in pandas shifts every bucket by the zone offset on a non-UTC
    # cluster. For LTZ, take the instant's epoch JVM-side (unix_timestamp
    # of an instant involves no zone); an NTZ ts transfers as naive wall
    # time untouched by the session zone, so the pandas path is already
    # zone-independent there (identical values under UTC either way).
    if dict(events.dtypes).get(ts_col) == "timestamp":
        events = events.withColumn("__epoch", F.unix_timestamp(ts_col))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            buckets, sums, version, evicted_below = state.get
            m = dict(zip(buckets, sums))
        else:
            m, version, evicted_below = {}, 0, None
        for pdf in pdfs:
            secs = (
                pdf["__epoch"] if "__epoch" in pdf.columns else _epoch_seconds(pdf[ts_col])
            )
            bk = secs // step * step
            # Presence and sums are tracked separately: ANY event (even a
            # NULL-valued one) extends the spine — the batch resample's
            # min/max is over all events — while the sum ignores NULLs, so
            # a bucket with ONLY nulls stays a gap (m[b] is None) exactly
            # like SUM(value) IS NULL in the oracle.
            for b in bk.unique():
                b = int(b)
                if evicted_below is not None and b < evicted_below:
                    continue  # older than the eviction horizon: watermark-drop
                m.setdefault(b, None)
            nn = pdf[value_col].notna()
            for b, v in pdf.loc[nn, value_col].groupby(bk[nn]).sum().items():
                b = int(b)
                if evicted_below is not None and b < evicted_below:
                    continue
                m[b] = (m[b] if m[b] is not None else 0.0) + float(v)
        if not m:
            return
        if len(m) > max_buckets:  # evict oldest observed buckets
            for b in sorted(m)[: len(m) - max_buckets]:
                del m[b]
            evicted_below = min(m)
        version += 1
        bs = sorted(m)
        state.update((bs, [m[b] for b in bs], version, evicted_below))
        out_b, out_v, out_obs = [], [], []
        last = None
        for b in range(bs[0], bs[-1] + step, step):
            v = m.get(b)
            if v is not None:
                last = v
                out_obs.append(True)
            else:
                # absent bucket OR NULL-only bucket: a gap for fill purposes
                out_obs.append(False)
            out_b.append(b)
            # head gaps before the first observation stay NULL, like the
            # oracle's LAST_VALUE IGNORE NULLS over an all-NULL prefix
            out_v.append(None if last is None else round(last, 4))
        yield pd.DataFrame(
            {
                "key": k,
                "bucket": out_b,
                "v_filled": out_v,
                "observed": out_obs,
                "version": version,
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
