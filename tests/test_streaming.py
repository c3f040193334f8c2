"""Structured Streaming tests: availableNow micro-batch drains over the
events parquet, cross-checked against the batch equivalents."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
EVENTS_PATH = f"{SF}/events.parquet"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Stage events into a directory (file-stream sources read directories;
    also normalizes the testdata's nanos timestamps to Spark micros)."""
    from qurious_spark.sources.readers import read_parquet

    d = str(tmp_path_factory.mktemp("events_stream"))
    read_parquet(spark, EVENTS_PATH).repartition(4).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def events_stream(spark, events_dir):
    from qurious_spark.streaming import read_events_stream

    return read_events_stream(spark, events_dir)


def test_tumbling_counts_matches_batch(spark, events_stream):
    from qurious_spark.streaming import run_to_memory, tumbling_counts
    import qurious_spark.queries as q

    q.load_all()
    got = run_to_memory(tumbling_counts(events_stream), "t_tumbling").collect()
    want = q.REGISTRY["events_tumbling_window"](spark, SF).collect()
    key = lambda r: (r.window_start, r.event_type)
    got_m = {key(r): (r.n_events, r.total_value) for r in got}
    want_m = {key(r): (r.n_events, r.total_value) for r in want}
    assert got_m == want_m


def test_sessionized_counts(spark, events_stream):
    from qurious_spark.streaming import run_to_memory, sessionized_counts

    rows = run_to_memory(sessionized_counts(events_stream), "t_sessions").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)
    # sessions for a given user must not overlap-start
    starts = {}
    for r in rows:
        starts.setdefault(r.user_id, []).append(r.session_start)
    for s in starts.values():
        assert len(s) == len(set(s))


def test_stateful_running_totals(spark, events_stream):
    from pyspark.sql import functions as F

    from qurious_spark.streaming import run_to_memory, user_running_totals

    got = run_to_memory(
        user_running_totals(events_stream), "t_running", output_mode="update"
    )
    # final state per user (last update wins) must equal the batch totals
    from qurious_spark.sources.readers import read_parquet

    batch = (
        read_parquet(spark, EVENTS_PATH)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .collect()
    )
    # memory sink in update mode appends each update; take the max n per user
    latest = {
        r.user_id: (r.n_events, r.total_value)
        for r in sorted(got.collect(), key=lambda r: r.n_events)
    }
    want = {r.user_id: (r.n, r.tv) for r in batch}
    assert set(latest) == set(want)
    for uid, (n, tv) in want.items():
        assert latest[uid][0] == n
        assert abs(latest[uid][1] - tv) < 0.01


def test_stream_dedup_exact_matches_batch(spark, events_stream):
    # exact streaming dedup on event_type-as-text: result count equals the
    # batch distinct-fingerprint count
    from qurious_spark.streaming import run_to_memory
    from qurious_spark.streaming.dedup import stream_dedup_exact

    out = run_to_memory(
        stream_dedup_exact(events_stream, text_col="event_type"),
        "dedup_exact_stream",
        output_mode="append",
    )
    from qurious_spark.sources.readers import read_parquet

    n_stream = out.count()
    n_batch = (
        read_parquet(spark, EVENTS_PATH).select("event_type").distinct().count()
    )
    assert n_stream == n_batch


def test_stream_dedup_within_watermark(spark, events_stream):
    from qurious_spark.streaming import run_to_memory
    from qurious_spark.streaming.dedup import stream_dedup_within_watermark

    out = run_to_memory(
        stream_dedup_within_watermark(
            events_stream, text_col="event_type", ts_col="ts", delay="1 hour"
        ),
        "dedup_wm_stream",
        output_mode="append",
    )
    from qurious_spark.sources.readers import read_parquet

    total = read_parquet(spark, EVENTS_PATH).count()
    distinct = read_parquet(spark, EVENTS_PATH).select("event_type").distinct().count()
    n = out.count()
    # dedup within watermark removes close-in-time repeats: strictly fewer
    # rows than the raw stream, at least one per distinct fingerprint
    assert distinct <= n < total


def test_stream_static_enrich(spark, events_stream):
    from qurious_spark.streaming import run_to_memory
    from qurious_spark.streaming.joins import stream_static_enrich

    dim = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive")],
        "event_type string, category string",
    )
    out = run_to_memory(
        stream_static_enrich(events_stream, dim, ("event_type", "event_type")).select(
            "event_id", "category"
        ),
        "enrich_stream",
        output_mode="append",
    )
    cats = {r.category for r in out.collect()}
    assert cats and cats <= {"interactive", "passive"}


def test_stream_stream_interval_join(spark, events_stream, events_dir):
    from qurious_spark.streaming import read_events_stream, run_to_memory
    from qurious_spark.streaming.joins import stream_stream_interval_join
    from qurious_spark.sources.readers import read_parquet

    right = read_events_stream(spark, events_dir)
    joined = stream_stream_interval_join(
        events_stream,
        right,
        key=("user_id", "user_id"),
        watermark="4 hours",
        interval="30 minutes",
    ).select(
        F.col("l.event_id").alias("lid"),
        F.col("r.event_id").alias("rid"),
    )
    out = run_to_memory(joined, "ssj_stream", output_mode="append")
    n_stream = out.count()

    # batch replica of the same interval join
    ev = read_parquet(spark, EVENTS_PATH)
    l, r = ev.alias("l"), ev.alias("r")
    n_batch = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 30 minutes")),
        ).count()
    )
    assert n_stream == n_batch


def test_stream_to_parquet_sink_exactly_once(spark, events_stream, events_dir, tmp_path):
    from qurious_spark.streaming import run_to_parquet
    from qurious_spark.streaming.dedup import stream_dedup_exact
    from qurious_spark.sources.readers import read_parquet

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    deduped = stream_dedup_exact(events_stream, text_col="event_type")
    run_to_parquet(deduped, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == read_parquet(spark, EVENTS_PATH).select("event_type").distinct().count()
    # re-running with the same checkpoint must be a no-op (offsets committed)
    run_to_parquet(stream_dedup_exact(events_stream, text_col="event_type"), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1


def test_stream_heavy_hitter_candidates(spark, events_dir):
    """Sharded Misra-Gries stream state: the latest per-shard summaries must
    contain every key whose global frequency exceeds n/capacity, across
    multiple micro-batches (4 files, 2 per trigger)."""
    from qurious_spark.streaming import read_events_stream, run_to_memory
    from qurious_spark.streaming.heavyhitters import stream_heavy_hitter_candidates

    capacity = 32
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    out = run_to_memory(
        stream_heavy_hitter_candidates(stream, "user_id", capacity=capacity, n_shards=4),
        "t_hh",
        output_mode="update",
    )
    rows = out.collect()
    assert rows, "no candidate emissions"
    # latest summary per shard
    latest_seq = {}
    for r in rows:
        latest_seq[r.shard] = max(latest_seq.get(r.shard, 0), r.seq)
    cands = {r.key for r in rows if r.seq == latest_seq[r.shard]}
    # exact truth from the batch side
    from qurious_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{SF}/events.parquet")
    n = ev.count()
    truth = {
        str(r.user_id)
        for r in ev.groupBy("user_id").count().filter(F.col("count") > n / capacity).collect()
    }
    assert truth, "test needs at least one guaranteed-heavy key"
    assert truth <= cands, f"missing guaranteed keys: {truth - cands}"
    # multiple micro-batches actually ran (seq grew past one batch's rows)
    assert len({r.seq for r in rows}) > len(latest_seq)


def test_incremental_merge_rollup(spark, events_dir, tmp_path):
    """Stream micro-batches MERGE partial aggregates into a managed rollup
    table; the final table must equal the batch groupBy over all data."""
    from qurious_spark.session import Session
    from qurious_spark.sources.readers import read_parquet
    from qurious_spark.streaming import read_events_stream
    from qurious_spark.streaming.rollup import incremental_count_rollup

    s = Session(spark)
    s.sql("DROP TABLE IF EXISTS ev_rollup")
    s.sql("CREATE TABLE ev_rollup (key VARCHAR, n_events BIGINT, total_value DOUBLE)")
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)  # 4 batches
    incremental_count_rollup(
        stream, s, "ev_rollup", "event_type", "value", str(tmp_path / "ckpt")
    )
    got = {
        r.key: (r.n_events, round(r.total_value, 4))
        for r in s.sql("SELECT key, n_events, total_value FROM ev_rollup").collect()
    }
    want = {
        r.event_type: (r.n, round(r.v, 4))
        for r in read_parquet(spark, EVENTS_PATH)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(got) == set(want)
    assert all(got[k][0] == want[k][0] for k in want)  # counts exact
    # double sums may differ in last ulp across different addition orders
    assert all(abs(got[k][1] - want[k][1]) < 1e-6 for k in want)
    s.sql("DROP TABLE ev_rollup")


def test_locf_stream_matches_batch_resample(spark, events_stream):
    """Single availableNow drain: latest emission per (key, bucket) must
    equal the batch resample(ffill) series."""
    from qurious_spark.operators.timeseries import resample
    from qurious_spark.sources.readers import read_parquet
    from qurious_spark.streaming import locf_stream, run_to_memory

    got_rows = run_to_memory(
        locf_stream(events_stream, step_seconds=3600),
        "t_locf",
        output_mode="update",
    ).collect()
    latest = {}
    for r in got_rows:
        cur = latest.get((r.key, r.bucket))
        if cur is None or r.version > cur[1]:
            latest[(r.key, r.bucket)] = ((r.v_filled, r.observed), r.version)
    batch = resample(
        read_parquet(spark, EVENTS_PATH),
        ts_col="ts",
        step_seconds=3600,
        keys=["event_type"],
        aggs=[
            (
                "v_sum",
                F.sum("value"),
            ),
            # unfilled twin of v_sum: the operator's `observed` contract is
            # SUM(value) IS NOT NULL (a NULL-only bucket is a gap), NOT
            # row-presence — same definition as the events_stream_gapfill
            # oracle
            ("v_raw", F.sum("value")),
        ],
        fill="ffill",
        fill_cols=["v_sum"],
    ).collect()
    want = {
        (r.event_type, r.bucket): (r.v_sum, r.v_raw is not None) for r in batch
    }
    assert set(latest) == set(want)
    for k, ((v, obs), _ver) in latest.items():
        wv, wobs = want[k]
        assert obs == wobs, k
        assert v == pytest.approx(round(wv, 4), abs=1e-3), k


def test_locf_stream_multibatch_out_of_order_files(spark, events_dir):
    """One file per micro-batch, in whatever order the source lists them:
    the versioned re-emission must converge to the same filled series as a
    single-batch drain (late buckets stay mergeable — nothing evicted at
    this scale)."""
    from qurious_spark.streaming import locf_stream, read_events_stream

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        locf_stream(stream, step_seconds=3600)
        .writeStream.format("memory")
        .queryName("t_locf_mb")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_locf_mb").collect()
    assert max(r.version for r in rows) > 1, "expected multiple micro-batches"
    latest = {}
    for r in rows:
        cur = latest.get((r.key, r.bucket))
        if cur is None or r.version > cur[1]:
            latest[(r.key, r.bucket)] = ((r.v_filled, r.observed), r.version)
    single = {}
    from qurious_spark.streaming import read_events_stream as rd
    from qurious_spark.streaming import run_to_memory

    one = run_to_memory(
        locf_stream(rd(spark, events_dir), step_seconds=3600),
        "t_locf_single",
        output_mode="update",
    ).collect()
    for r in one:
        single[(r.key, r.bucket)] = (r.v_filled, r.observed)
    assert set(latest) == set(single)
    for k, ((v, obs), _ver) in latest.items():
        sv, sobs = single[k]
        assert obs == sobs, k
        assert v == pytest.approx(sv, abs=1e-3), k


def test_locf_stream_eviction_bounds_state(spark, events_dir):
    """With a small max_buckets the retained series is clipped to the newest
    buckets and late data below the eviction horizon stays dropped."""
    from qurious_spark.streaming import locf_stream, read_events_stream, run_to_memory

    rows = run_to_memory(
        locf_stream(read_events_stream(spark, events_dir), step_seconds=3600, max_buckets=24),
        "t_locf_evict",
        output_mode="update",
    ).collect()
    latest = {}
    for r in rows:
        cur = latest.get((r.key, r.bucket))
        if cur is None or r.version > cur[1]:
            latest[(r.key, r.bucket)] = (r, r.version)
    per_key = {}
    for (k, b), _ in latest.items():
        per_key.setdefault(k, []).append(b)
    for k, buckets in per_key.items():
        observed = [
            b for b in buckets if latest[(k, b)][0].observed
        ]
        assert len(observed) <= 24, (k, len(observed))
        # the clipped series must be the NEWEST buckets: its span ends at the
        # key's true max bucket (events run to end of January)
        assert max(buckets) >= 1706340000, k


def test_locf_stream_null_values_stay_gaps(spark, tmp_path):
    """A bucket whose only events carry NULL values must stay a gap (carried
    forward), matching batch SUM semantics — not become an observed 0.0."""
    import datetime as dt

    from pyspark.sql import Row

    from qurious_spark.streaming import locf_stream
    from qurious_spark.streaming.events import run_to_memory

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(ts=base, event_type="x", value=7.0),
        Row(ts=base + dt.timedelta(hours=1), event_type="x", value=None),
        Row(ts=base + dt.timedelta(hours=2), event_type="x", value=3.0),
    ]
    d = str(tmp_path / "nulls")
    spark.createDataFrame(rows, "ts timestamp, event_type string, value double").write.parquet(d)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double").parquet(d)
    )
    got = {
        r.bucket: (r.v_filled, r.observed)
        for r in run_to_memory(
            locf_stream(stream, step_seconds=3600), "t_locf_nulls", output_mode="update"
        ).collect()
    }
    b0 = int(base.timestamp())
    assert got[b0] == (7.0, True)
    assert got[b0 + 3600] == (7.0, False)  # NULL-only bucket: gap, carried
    assert got[b0 + 7200] == (3.0, True)


def test_locf_stream_null_only_boundary_buckets_extend_spine(spark, tmp_path):
    """NULL-only buckets at the series HEAD and TAIL must still extend the
    spine (the batch resample's min/max is over all events, not just
    non-NULL ones) while staying gaps; the head gap fills to NULL like the
    oracle's LAST_VALUE IGNORE NULLS over an all-NULL prefix."""
    import datetime as dt

    from pyspark.sql import Row

    from qurious_spark.streaming import locf_stream
    from qurious_spark.streaming.events import run_to_memory

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(ts=base, event_type="x", value=None),  # head: NULL-only bucket
        Row(ts=base + dt.timedelta(hours=1), event_type="x", value=5.0),
        # hour 2 has no events at all (plain gap)
        Row(ts=base + dt.timedelta(hours=3), event_type="x", value=None),  # tail
    ]
    d = str(tmp_path / "null_bounds")
    spark.createDataFrame(rows, "ts timestamp, event_type string, value double").write.parquet(d)
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double").parquet(d)
    )
    got = {
        r.bucket: (r.v_filled, r.observed)
        for r in run_to_memory(
            locf_stream(stream, step_seconds=3600), "t_locf_bounds", output_mode="update"
        ).collect()
    }
    b0 = int(base.timestamp())
    assert set(got) == {b0, b0 + 3600, b0 + 7200, b0 + 10800}
    assert got[b0] == (None, False)  # head NULL-only: in spine, unfilled
    assert got[b0 + 3600] == (5.0, True)
    assert got[b0 + 7200] == (5.0, False)
    assert got[b0 + 10800] == (5.0, False)  # tail NULL-only: spine extends


def test_scd2_stream_maintains_versioned_dimension(spark, tmp_path):
    """Streaming SCD2: two sequential availableNow drains (two update
    batches at different event times) must leave the managed dim equal to
    applying the batches through the batch operator in order — closed
    versions stamped with each batch's max event time, time travel intact."""
    import datetime as dt

    from qurious_spark.session import Session
    from qurious_spark.streaming import scd2_stream

    s = Session(spark)
    s.sql("DROP TABLE IF EXISTS scd_dim")
    s.sql(
        "CREATE TABLE scd_dim (k BIGINT, seg VARCHAR, "
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN)"
    )
    s.sql(
        "INSERT INTO scd_dim VALUES "
        "(1, 'A', TIMESTAMP '2020-01-01', NULL, TRUE), "
        "(2, 'B', TIMESTAMP '2020-01-01', NULL, TRUE)"
    )
    upd_dir = tmp_path / "upd"
    upd_dir.mkdir()
    schema = "k bigint, seg string, ts timestamp"
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(upd_dir))
        scd2_stream(stream, s, "scd_dim", "k", ["seg"], "ts", ckpt)

    def add_file(rows, name):
        # the file source lists the top directory only: write each batch as
        # one flat parquet file
        import glob as g
        import shutil

        tmp = str(tmp_path / f"tmp_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        shutil.move(g.glob(tmp + "/part-*.parquet")[0], str(upd_dir / f"{name}.parquet"))

    # batch 1: key 1 changes twice in-batch (latest wins), key 3 is new
    add_file(
        [
            (1, "A1", dt.datetime(2024, 1, 1)),
            (1, "A2", dt.datetime(2024, 1, 2)),
            (3, "C", dt.datetime(2024, 1, 2)),
        ],
        "b1",
    )
    drain()
    # batch 2 (same checkpoint -> only the new file): key 1 changes again,
    # key 2 arrives unchanged
    add_file(
        [(1, "A3", dt.datetime(2024, 2, 1)), (2, "B", dt.datetime(2024, 2, 1))],
        "b2",
    )
    drain()

    rows = s.sql("SELECT * FROM scd_dim").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    k1 = sorted(by_key[1], key=lambda r: (r.valid_from, str(r.valid_to)))
    assert [(r.seg, r.is_current) for r in k1] == [
        ("A", False),
        ("A2", False),  # in-batch latest of batch 1, closed by batch 2
        ("A3", True),
    ]
    assert k1[0].valid_to == dt.datetime(2024, 1, 2)  # batch 1 max ts
    assert k1[1].valid_to == dt.datetime(2024, 2, 1)  # batch 2 max ts
    (k2,) = by_key[2]
    assert k2.seg == "B" and k2.is_current and k2.valid_from == dt.datetime(2020, 1, 1)
    (k3,) = by_key[3]
    assert k3.seg == "C" and k3.is_current
    # versioned mutation: the pre-stream state is still reachable
    hist = s.sql("SELECT count(*) AS c FROM scd_dim VERSION AS OF 1").collect()
    assert hist[0].c == 2
    s.sql("DROP TABLE scd_dim")


def test_scd2_stream_clamps_late_batch_timestamp(spark, tmp_path):
    """A drain whose max event time precedes an open version's valid_from
    must not produce an inverted validity interval (round-5 advisor
    finding): the effective timestamp clamps to the open versions' max
    valid_from."""
    import datetime as dt
    import glob as g
    import shutil

    from qurious_spark.session import Session
    from qurious_spark.streaming import scd2_stream

    s = Session(spark)
    s.sql("DROP TABLE IF EXISTS scd_late")
    s.sql(
        "CREATE TABLE scd_late (k BIGINT, seg VARCHAR, "
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN)"
    )
    s.sql(
        "INSERT INTO scd_late VALUES "
        "(1, 'A', TIMESTAMP '2024-05-01', NULL, TRUE)"
    )
    upd_dir = tmp_path / "upd"
    upd_dir.mkdir()
    schema = "k bigint, seg string, ts timestamp"
    # late file: event time BEFORE the open version's valid_from
    tmp = str(tmp_path / "tmp_b1")
    spark.createDataFrame(
        [(1, "B", dt.datetime(2024, 1, 1))], schema
    ).coalesce(1).write.parquet(tmp)
    shutil.move(g.glob(tmp + "/part-*.parquet")[0], str(upd_dir / "b1.parquet"))
    stream = spark.readStream.schema(schema).parquet(str(upd_dir))
    scd2_stream(stream, s, "scd_late", "k", ["seg"], "ts", str(tmp_path / "ckpt"))

    rows = s.sql("SELECT * FROM scd_late").collect()
    assert all(
        r.valid_to is None or r.valid_to >= r.valid_from for r in rows
    ), rows
    closed = [r for r in rows if not r.is_current][0]
    assert closed.valid_to == dt.datetime(2024, 5, 1)  # clamped, not 2024-01-01
    new = [r for r in rows if r.is_current][0]
    assert new.seg == "B" and new.valid_from == dt.datetime(2024, 5, 1)


def test_scd2_stream_clamp_floor_only_over_touched_keys(spark, tmp_path):
    """Round-6 advisor refinement: the monotonicity floor is the max
    valid_from of the open versions the batch TOUCHES — an unrelated key
    opened more recently than the batch's event time must not inflate the
    effective timestamp stamped onto other keys."""
    import datetime as dt
    import glob as g
    import shutil

    from qurious_spark.session import Session
    from qurious_spark.streaming import scd2_stream

    s = Session(spark)
    s.sql("DROP TABLE IF EXISTS scd_floor")
    s.sql(
        "CREATE TABLE scd_floor (k BIGINT, seg VARCHAR, "
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN)"
    )
    # key 1 open since May 1; key 2 open since June 1 (the decoy)
    s.sql(
        "INSERT INTO scd_floor VALUES "
        "(1, 'A', TIMESTAMP '2024-05-01', NULL, TRUE), "
        "(2, 'X', TIMESTAMP '2024-06-01', NULL, TRUE)"
    )
    upd_dir = tmp_path / "upd"
    upd_dir.mkdir()
    schema = "k bigint, seg string, ts timestamp"
    # batch touches ONLY key 1, at a time after key 1's valid_from but
    # before key 2's — no clamp is warranted
    tmp = str(tmp_path / "tmp_b1")
    spark.createDataFrame(
        [(1, "B", dt.datetime(2024, 5, 15))], schema
    ).coalesce(1).write.parquet(tmp)
    shutil.move(g.glob(tmp + "/part-*.parquet")[0], str(upd_dir / "b1.parquet"))
    stream = spark.readStream.schema(schema).parquet(str(upd_dir))
    scd2_stream(stream, s, "scd_floor", "k", ["seg"], "ts", str(tmp_path / "ckpt"))

    rows = s.sql("SELECT * FROM scd_floor").collect()
    closed = [r for r in rows if not r.is_current]
    assert len(closed) == 1 and closed[0].k == 1
    # stamped with the batch's OWN event time, not key 2's valid_from
    assert closed[0].valid_to == dt.datetime(2024, 5, 15)
    k1_new = [r for r in rows if r.is_current and r.k == 1][0]
    assert k1_new.seg == "B" and k1_new.valid_from == dt.datetime(2024, 5, 15)
    k2 = [r for r in rows if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].seg == "X"
    s.sql("DROP TABLE scd_floor")
