"""Property-based check of the incremental MERGE rollup: any event log,
under any micro-batch split, must leave the managed rollup table equal to
the batch groupBy over the whole log — including NULL measurement values
(SUM skips them; a key whose values are ALL NULL has a NULL total) and
NULL grouping keys (one group, like GROUP BY)."""

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


@st.composite
def _batched_events(draw):
    n_batches = draw(st.integers(1, 3))
    return [
        draw(
            st.lists(
                st.tuples(
                    st.sampled_from(["a", "b", None]),
                    st.one_of(st.none(), st.integers(-5, 20)),
                ),
                min_size=1,
                max_size=5,
            )
        )
        for _ in range(n_batches)
    ]


def _model(batches):
    """Batch-groupBy semantics: n counts ROWS, total sums non-NULL values
    (NULL when every value for the key is NULL)."""
    agg = {}
    for rows in batches:
        for k, v in rows:
            n, total = agg.get(k, (0, None))
            n += 1
            if v is not None:
                total = (total if total is not None else 0.0) + float(v)
            agg[k] = (n, total)
    return agg


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(batches=_batched_events())
def test_incremental_rollup_matches_batch_groupby(spark, batches):
    from qurious_spark.session import Session
    from qurious_spark.streaming.rollup import incremental_count_rollup

    s = Session(spark)
    s.sql("DROP TABLE IF EXISTS rollup_prop")
    s.sql(
        "CREATE TABLE rollup_prop (key VARCHAR, n_events BIGINT, total_value DOUBLE)"
    )
    work = tempfile.mkdtemp(prefix="rollup_prop_")
    try:
        ev_dir = os.path.join(work, "events")
        os.mkdir(ev_dir)
        schema = "event_type string, ts timestamp, value double"
        for i, rows in enumerate(batches):
            data = [
                (k, _BASE + dt.timedelta(hours=i), None if v is None else float(v))
                for k, v in rows
            ]
            tmp = os.path.join(work, f"tmp_{i}")
            spark.createDataFrame(data, schema).coalesce(1).write.parquet(tmp)
            shutil.move(
                glob.glob(tmp + "/part-*.parquet")[0],
                os.path.join(ev_dir, f"b{i}.parquet"),
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        incremental_count_rollup(
            stream, s, "rollup_prop", "event_type", "value",
            os.path.join(work, "ckpt"),
        )
        rows = s.sql("SELECT key, n_events, total_value FROM rollup_prop").collect()
        got = {}
        for r in rows:
            assert r.key not in got, f"duplicate rollup row for key {r.key!r}"
            got[r.key] = (r.n_events, r.total_value)
        want = _model(batches)
        assert set(got) == set(want), f"batches={batches}"
        for k, (n, total) in want.items():
            gn, gt = got[k]
            assert gn == n, (k, batches)
            if total is None:
                assert gt is None, (k, batches)
            else:
                assert gt is not None and abs(gt - total) < 1e-6, (k, batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        s.sql("DROP TABLE IF EXISTS rollup_prop")
