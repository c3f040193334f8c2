"""Property-based check of streaming Misra-Gries heavy hitters: for ANY
key sequence and ANY micro-batch split, the latest per-shard summaries must
(a) contain every key whose global frequency is >= n/capacity (the
candidate-superset guarantee the batch recount relies on), and (b) never
OVER-estimate a key (MG residuals undercount by at most shard_n/capacity,
bounded below via each shard's emitted seq)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

N_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES_STREAM", "8"))

_BASE = dt.datetime(2024, 1, 1)
# skew the draw toward two hot keys so the guarantee set is non-trivial
_KEY_POOL = ["h1"] * 6 + ["h2"] * 3 + ["c1", "c2", "c3", "c4", "c5", "c6"]
_CAPACITY = 4
_N_SHARDS = 2


@st.composite
def _batched_keys(draw):
    n_batches = draw(st.integers(1, 3))
    return [
        draw(st.lists(st.sampled_from(_KEY_POOL), min_size=3, max_size=15))
        for _ in range(n_batches)
    ]


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(batches=_batched_keys())
def test_stream_heavy_hitters_guarantees(spark, batches):
    from qurious_spark.streaming.heavyhitters import stream_heavy_hitter_candidates

    work = tempfile.mkdtemp(prefix="hh_prop_")
    try:
        ev_dir = os.path.join(work, "events")
        os.mkdir(ev_dir)
        schema = "event_type string, ts timestamp"
        for i, keys in enumerate(batches):
            data = [(k, _BASE + dt.timedelta(hours=i)) for k in keys]
            tmp = os.path.join(work, f"tmp_{i}")
            spark.createDataFrame(data, schema).coalesce(1).write.parquet(tmp)
            shutil.move(
                glob.glob(tmp + "/part-*.parquet")[0],
                os.path.join(ev_dir, f"b{i}.parquet"),
            )
        collected = []

        def sink(bdf, _bid):
            collected.extend(bdf.collect())

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        q = (
            stream_heavy_hitter_candidates(
                stream, "event_type", capacity=_CAPACITY, n_shards=_N_SHARDS
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        q.awaitTermination()

        latest_seq = {}
        for r in collected:
            latest_seq[r.shard] = max(latest_seq.get(r.shard, 0), r.seq)
        latest = [r for r in collected if r.seq == latest_seq[r.shard]]
        est = {r.key: r.est for r in latest}
        shard_of = {r.key: r.shard for r in latest}

        truth = {}
        for keys in batches:
            for k in keys:
                truth[k] = truth.get(k, 0) + 1
        n = sum(truth.values())
        # (a) candidate-superset guarantee
        guaranteed = {k for k, c in truth.items() if c >= n / _CAPACITY}
        missing = guaranteed - set(est)
        assert not missing, f"guaranteed keys absent: {missing}; batches={batches}"
        # (b) MG residual bounds: never over-estimates, undercounts by at
        # most its shard's rows / capacity
        for k, e in est.items():
            assert e <= truth[k], (k, e, truth[k], batches)
            shard_n = latest_seq[shard_of[k]]
            assert e >= truth[k] - shard_n / _CAPACITY, (k, e, truth[k], batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)
