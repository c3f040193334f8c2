"""Bit-exact pins for the r13 size-gated final sort (queries/__init__.py
final_sort_small).

Every converted query must produce the EXACT same rows, in the EXACT same
order, with the EXACT same schema as the original single-statement ORDER BY
form — on BOTH sides of the size gate (coalesce(1)+sortWithinPartitions
below, plain orderBy above). The gate env var is read per call, so both
branches are exercised inside one session.
"""

from __future__ import annotations

import struct

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from qurious_spark.session import get_spark

    return get_spark()


def _bits(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                struct.pack(">d", v) if isinstance(v, float) else v for v in r
            )
        )
    return out


def assert_frames_bit_equal(a, b):
    assert a.schema == b.schema, f"schema drift:\n{a.schema}\n{b.schema}"
    assert _bits(a.collect()) == _bits(b.collect())


def test_sql_final_sort_queries_match_original(spark):
    """Each sql_query_final_sort entry == the original inner+ORDER BY text,
    rows AND order AND schema."""
    import qurious_spark.queries as q

    q.load_all()
    q.ensure_views(spark, SF)
    assert q.FINAL_SORT_FORMS, "no final-sort queries registered"
    for name, (inner, order_by) in q.FINAL_SORT_FORMS.items():
        original = spark.sql(f"{inner}\n    ORDER BY {order_by}")
        assert_frames_bit_equal(original, q.REGISTRY[name](spark, SF))


def test_final_sort_above_gate_is_plain_orderby(spark, monkeypatch):
    """Forcing the gate low (threshold 0 => nothing is 'small') must fall
    back to the untouched wide ORDER BY plan — and still match."""
    import qurious_spark.queries as q

    q.load_all()
    q.ensure_views(spark, SF)
    name, (inner, order_by) = next(iter(q.FINAL_SORT_FORMS.items()))
    monkeypatch.setenv("SPARK_GRAFT_SORT1_BYTES", "0")
    above = q.REGISTRY[name](spark, SF)
    plan = above._jdf.queryExecution().optimizedPlan().toString()
    assert "Coalesce" not in plan, "gate=0 must keep the wide sort"
    original = spark.sql(f"{inner}\n    ORDER BY {order_by}")
    assert_frames_bit_equal(original, above)


def test_final_sort_below_gate_plans_no_range_exchange(spark, monkeypatch):
    """Below the gate the plan must carry Coalesce(1) and NO
    rangepartitioning exchange (that exchange plus the RangePartitioner
    sampling job are exactly the two jobs the rewrite removes)."""
    import qurious_spark.queries as q

    q.load_all()
    q.ensure_views(spark, SF)
    monkeypatch.setenv("SPARK_GRAFT_SORT1_BYTES", str(1 << 40))
    for name in q.FINAL_SORT_FORMS:
        df = q.REGISTRY[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan, f"{name}: range sort survived"
        assert "Coalesce" in plan, f"{name}: coalesced sort missing"


def test_df_final_sort_queries_match_orderby(spark, monkeypatch):
    """The df-form call sites (tpch_q10/q11/q13/q15) must match their own
    orderBy variant on both gate branches."""
    import qurious_spark.queries as q

    q.load_all()
    q.ensure_views(spark, SF)
    for name in ("tpch_q10", "tpch_q11", "tpch_q13", "tpch_q15"):
        monkeypatch.setenv("SPARK_GRAFT_SORT1_BYTES", "0")
        wide = q.REGISTRY[name](spark, SF)
        monkeypatch.setenv("SPARK_GRAFT_SORT1_BYTES", str(1 << 40))
        small = q.REGISTRY[name](spark, SF)
        assert_frames_bit_equal(wide, small)


def test_order_columns_parser():
    from qurious_spark.queries import _order_columns

    cols = _order_columns("a, b DESC, c ASC, d desc")
    texts = [str(c) for c in cols]
    assert "ASC" in texts[0] and "'a" in texts[0]
    assert "DESC" in texts[1] and "'b" in texts[1]
    assert "ASC" in texts[2] and "'c" in texts[2]
    assert "DESC" in texts[3] and "'d" in texts[3]
