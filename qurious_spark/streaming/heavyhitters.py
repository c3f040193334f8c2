"""Streaming heavy hitters: Misra-Gries state over a sharded key space.

Streaming counterpart of operators/heavyhitters.py. The key space is
sharded by key hash (``pmod(hash(key), n_shards)``); each shard keeps ONE
Misra-Gries summary with ``capacity`` counters as stream state
(constant-size: two arrays per shard, regardless of stream length), updated
per micro-batch with the mergeable-summaries decrement rule.

Because sharding is BY KEY, all occurrences of a key land in one shard, so
a key with global frequency > stream_n / capacity exceeds its shard's
n_shard / capacity bound and is guaranteed present in that shard's summary
— the union of shard candidates is a superset of the true heavy hitters
for ratio >= 1/capacity, exactly as in the batch operator (whose exact
recount can then be run over the candidates on the archived data).

State size: n_shards * capacity counters total, partitioned across
executors. No watermark needed — the summary never grows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("key", StringType()),
        StructField("est", LongType()),
        StructField("seq", LongType()),  # rows processed by this shard so far
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("seq", LongType()),
    ]
)


from qurious_spark.operators.heavyhitters import mg_add  # shared MG merge rule


def _mg_state_fn(capacity: int, key_col: str):
    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (shard,) = key
        if state.exists:
            keys, counts, seq = state.get
            counters = pd.Series(list(counts), index=list(keys), dtype="int64")
        else:
            counters, seq = None, 0
        for pdf in pdfs:
            seq += len(pdf)
            counters = mg_add(counters, pdf[key_col].value_counts(), capacity)
        if counters is None:
            return
        state.update((list(counters.index), [int(c) for c in counters], seq))
        yield pd.DataFrame(
            {
                "shard": shard,
                "key": counters.index,
                "est": counters.to_numpy(dtype="int64"),
                "seq": seq,
            }
        )

    return fn


def stream_heavy_hitter_candidates(
    events: DataFrame,
    key_col: str,
    capacity: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Per-micro-batch candidate emission: (shard, key, est, seq).

    ``est`` is the Misra-Gries residual count (undercounts by at most
    n_shard/capacity); the latest emission per shard (max ``seq``) is that
    shard's current summary. Guarantee: any key with global frequency
    >= stream_n/capacity is present in the latest emissions.
    """
    keyed = events.select(
        F.col(key_col).cast("string").alias("k"),
        F.pmod(F.hash(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("bigint")
        .alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _mg_state_fn(capacity, "k"),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
