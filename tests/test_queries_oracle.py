"""Registry-vs-DuckDB oracle checks at sf0.001 (fast smoke tier).

The full sweep at sf0.01 is ``python tools/check_correctness.py`` (the
driver's gate); here a representative subset keeps pytest quick.
"""

import pytest

SAMPLE = [
    "tpch_q1",
    "tpch_q5",
    "tpch_q11",
    "agg_distinct",
    "join_full_outer",
    "window_row_number",
    "not_in_with_null",
    "correlated_scalar_subquery",
    "rollup_agg",
]


@pytest.fixture(scope="module")
def registry():
    import qurious_spark.queries as q

    q.load_all()
    return q


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(name, registry, spark, duck):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import compare

    df = registry.REGISTRY[name](spark, "/root/testdata/sf0.001")
    problems, _oracle_rows = compare(name, df, duck, registry.ORACLES[name])
    assert not problems, problems


def test_all_registered_queries_have_unique_names(registry):
    assert len(registry.REGISTRY) >= 69
    # every oracle key must have a query
    assert set(registry.ORACLES) <= set(registry.REGISTRY)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
