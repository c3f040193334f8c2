"""The driver hash-checks a bounded prefix of queries() — pin its contents.

Every SURVEY §2 row and LLM-pipeline family must keep a representative
inside the first 50 entries, and each of those must be hash-checkable
(have an oracle), or the round's hard correctness signal silently loses
coverage.
"""

import __spark_entry__ as entry
from qurious_spark.queries import DRIVER_PRIORITY

WINDOW = 50


def test_priority_names_resolve_and_fit_window():
    q = entry.queries()
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY)), "duplicate priority name"
    assert len(DRIVER_PRIORITY) == WINDOW
    assert list(q)[:WINDOW] == list(DRIVER_PRIORITY)


def test_priority_entries_are_hash_checkable():
    oracles = entry.oracle_sql()
    missing = [n for n in DRIVER_PRIORITY if n not in oracles]
    assert not missing, f"priority entries without an oracle: {missing}"


def test_oracle_keys_subset_of_queries():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
