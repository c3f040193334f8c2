"""Property-based check of streaming LOCF gapfill: random event logs split
into random micro-batches, drained through ``locf_stream`` one file per
drain, must converge to an independent pure-Python replay of the documented
semantics — per-key bucket sums, NULL-only buckets staying gaps, LOCF over
the observed span, and (the part no example test walks) the
``max_buckets`` eviction horizon interacting with late out-of-order
batches: buckets older than ``evicted_below`` are watermark-dropped.

Batch ORDER is controlled (one drain per file addition against a shared
checkpoint), because with eviction the final state is order-dependent —
the existing multibatch test only covers the eviction-free regime where
any order converges.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

N_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES_STREAM", "6"))

_BASE = dt.datetime(2024, 1, 1)
_STEP = 3600
_KEYS = ["a", "b"]


@st.composite
def _batched_events(draw):
    """1-3 micro-batches of (key, bucket_idx, minute, value) events; value
    None models a NULL measurement (extends the spine, stays a gap)."""
    n_batches = draw(st.integers(1, 3))
    batches = []
    for _ in range(n_batches):
        rows = draw(
            st.lists(
                st.tuples(
                    st.sampled_from(_KEYS),
                    st.integers(0, 9),  # bucket index (hours from _BASE)
                    st.integers(0, 59),  # minute offset inside the bucket
                    st.one_of(st.none(), st.integers(-5, 20)),
                ),
                min_size=1,
                max_size=5,
            )
        )
        batches.append(rows)
    max_buckets = draw(st.sampled_from([3, 1024]))  # eviction on / off
    return batches, max_buckets


def _bucket_of(idx: int) -> int:
    ts = _BASE + dt.timedelta(hours=idx)
    return int((ts - dt.datetime(1970, 1, 1)).total_seconds()) // _STEP * _STEP


def _model_replay(batches, max_buckets):
    """Sequential replay of the documented contract: returns the
    latest-version emission per (key, bucket) as
    {(key, bucket): (v_filled, observed)}."""
    state = {}  # key -> [m: {bucket: sum|None}, evicted_below|None]
    emitted = {}
    for rows in batches:
        by_key = {}
        for k, idx, _minute, v in rows:
            by_key.setdefault(k, []).append((_bucket_of(idx), v))
        for k, evs in by_key.items():
            m, ev = state.setdefault(k, [{}, None])
            for b, _v in evs:
                if ev is not None and b < ev:
                    continue  # older than the eviction horizon
                m.setdefault(b, None)
            for b, v in evs:
                if v is None or (ev is not None and b < ev):
                    continue
                m[b] = (m[b] if m[b] is not None else 0.0) + float(v)
            if len(m) > max_buckets:
                for b in sorted(m)[: len(m) - max_buckets]:
                    del m[b]
                state[k][1] = min(m)
            if not m:
                continue
            bs = sorted(m)
            last = None
            for b in range(bs[0], bs[-1] + _STEP, _STEP):
                v = m.get(b)
                obs = v is not None
                if obs:
                    last = v
                emitted[(k, b)] = (None if last is None else round(last, 4), obs)
            # drop emissions for buckets this key no longer carries: the
            # real sink keeps them, but only re-emitted buckets are
            # comparable after eviction shrinks the span — prune both sides
            span = set(range(bs[0], bs[-1] + _STEP, _STEP))
            for kk in [kk for kk in emitted if kk[0] == k and kk[1] not in span]:
                del emitted[kk]
    return emitted


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(case=_batched_events())
def test_locf_stream_matches_replay_model(spark, case):
    from qurious_spark.streaming import locf_stream

    batches, max_buckets = case
    work = tempfile.mkdtemp(prefix="locf_prop_")
    try:
        ev_dir = os.path.join(work, "events")
        os.mkdir(ev_dir)
        ckpt = os.path.join(work, "ckpt")
        schema = "event_type string, ts timestamp, value double"
        collected = []

        def sink(bdf, _bid):
            collected.extend(bdf.collect())

        for i, rows in enumerate(batches):
            data = [
                (
                    k,
                    _BASE + dt.timedelta(hours=idx, minutes=minute),
                    None if v is None else float(v),
                )
                for k, idx, minute, v in rows
            ]
            tmp = os.path.join(work, f"tmp_{i}")
            spark.createDataFrame(data, schema).coalesce(1).write.parquet(tmp)
            shutil.move(
                glob.glob(tmp + "/part-*.parquet")[0],
                os.path.join(ev_dir, f"b{i}.parquet"),
            )
            stream = spark.readStream.schema(schema).parquet(ev_dir)
            q = (
                locf_stream(
                    stream,
                    ts_col="ts",
                    key_col="event_type",
                    value_col="value",
                    step_seconds=_STEP,
                    max_buckets=max_buckets,
                )
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
        latest = {}
        for r in collected:
            cur = latest.get((r.key, r.bucket))
            if cur is None or r.version > cur[1]:
                latest[(r.key, r.bucket)] = ((r.v_filled, r.observed), r.version)
        want = _model_replay(batches, max_buckets)
        # prune sink rows for buckets the model pruned after eviction (the
        # sink legitimately retains stale pre-eviction emissions)
        got = {kk: vo for kk, (vo, _ver) in latest.items() if kk in want}
        assert set(got) == set(want), f"case={case}"
        for kk, (v, obs) in got.items():
            wv, wobs = want[kk]
            assert obs == wobs, (kk, case)
            if wv is None:
                assert v is None, (kk, case)
            else:
                assert v == pytest.approx(wv, abs=1e-6), (kk, case)
    finally:
        shutil.rmtree(work, ignore_errors=True)
