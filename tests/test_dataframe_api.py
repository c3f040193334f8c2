"""Fluent-layer tests (reference entry points B/C: dataframe/mod.rs,
logical/builder.rs) + COPY TO."""

import os
import tempfile


def test_project_filter_aggregate(session):
    rows = (
        session.frame("lineitem")
        .filter("l_quantity > 45")
        .aggregate(["l_returnflag"], ["count(*) AS c", "round(sum(l_quantity), 2) AS q"])
        .sort("l_returnflag")
        .collect()
    )
    assert len(rows) == 3 and all(r.c > 0 for r in rows)


def test_join_and_limit(session):
    rows = (
        session.frame("nation")
        .alias("n")
        .join(session.frame("region").alias("r"), "inner", "n_regionkey = r_regionkey")
        .project("n_name", "r_name")
        .sort("n_name")
        .limit(5, skip=2)
        .collect()
    )
    assert len(rows) == 5


def test_builder_parity_with_sql(session):
    got = (
        session.frame("orders")
        .aggregate(["o_orderstatus"], ["count(*) AS c"])
        .having("c > 10")
        .sort("o_orderstatus")
        .collect()
    )
    want = session.sql(
        "SELECT o_orderstatus, count(*) AS c FROM orders GROUP BY o_orderstatus HAVING c > 10 ORDER BY o_orderstatus"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_cross_join_distinct_union(session):
    n = session.frame("region").cross_join(session.frame("region")).collect()
    assert len(n) == 25
    u = (
        session.frame("region")
        .project("r_regionkey AS k")
        .union(session.frame("region").project("r_regionkey AS k"), all=False)
        .collect()
    )
    assert len(u) == 5


def test_copy_to_parquet_roundtrip(session):
    d = os.path.join(tempfile.mkdtemp(), "region_out")
    n = session.sql(f"COPY region TO '{d}' (FORMAT PARQUET)").collect()[0][0]
    assert n == 5
    back = session.spark.read.parquet(d)
    assert back.count() == 5
    assert set(back.columns) == {"r_regionkey", "r_name"}


def test_copy_to_csv(session):
    d = os.path.join(tempfile.mkdtemp(), "nation_csv")
    session.sql(f"COPY nation TO '{d}' (FORMAT CSV, DELIMITER '|')")
    files = [f for f in os.listdir(d) if f.endswith(".csv")]
    assert files
    head = open(os.path.join(d, files[0])).readline()
    assert "|" in head
