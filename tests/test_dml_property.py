"""Property-based DML: random INSERT/DELETE/UPDATE sequences vs a Python model.

The reference's test strategy has no property-based coverage (SURVEY §5); the
managed-table layer (session.py ManagedTable) is exactly the kind of
stateful code that benefits from it.  Each example replays a random op
sequence against both the engine and a trivial in-memory model and compares
final table contents as multisets, including NULL-predicate semantics
(rows where the predicate is NULL are neither deleted nor updated).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vals = st.one_of(st.none(), st.integers(-5, 5))
_texts = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
_rows = st.lists(st.tuples(_vals, _texts), min_size=1, max_size=4)
_cmp = st.sampled_from(["<", "=", ">"])
_pred = st.tuples(_cmp, st.integers(-5, 5))

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), _rows),
        st.tuples(st.just("delete"), _pred),
        st.tuples(st.just("update"), st.tuples(st.sampled_from(["x", "y", "z"]), _pred)),
        st.tuples(
            st.just("merge"),
            st.tuples(st.integers(-5, 5), st.sampled_from(["x", "y", "z"])),
        ),
        st.tuples(st.just("merge_del"), st.integers(-5, 5)),
    ),
    min_size=1,
    max_size=5,
)


def _holds(a: int | None, op: str, x: int) -> bool:
    if a is None:
        return False  # SQL: NULL comparison is NULL → predicate not satisfied
    return {"<": a < x, "=": a == x, ">": a > x}[op]


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


@pytest.fixture(scope="module")
def dml_session(spark):
    from qurious_spark.session import Session

    return Session(spark)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@pytest.mark.slow
@given(ops=_ops)
def test_dml_sequence_matches_model(dml_session, ops):
    s = dml_session
    s.sql("DROP TABLE IF EXISTS prop_t")
    s.sql("CREATE TABLE prop_t (a INT, b VARCHAR)")
    model: list[tuple[int | None, str | None]] = []

    for kind, arg in ops:
        if kind == "insert":
            values = ", ".join(f"({_lit(a)}, {_lit(b)})" for a, b in arg)
            s.sql(f"INSERT INTO prop_t VALUES {values}")
            model.extend(arg)
        elif kind == "delete":
            op, x = arg
            s.sql(f"DELETE FROM prop_t WHERE a {op} {x}")
            model = [r for r in model if not _holds(r[0], op, x)]
        elif kind == "update":
            newb, (op, x) = arg
            s.sql(f"UPDATE prop_t SET b = '{newb}' WHERE a {op} {x}")
            model = [
                (r[0], newb) if _holds(r[0], op, x) else r for r in model
            ]
        elif kind == "merge":
            # single-row source: upsert (update matched b, else insert)
            key, newb = arg
            s.sql(
                f"MERGE INTO prop_t t USING (SELECT {key} AS k, '{newb}' AS nb) s "
                "ON t.a = s.k "
                "WHEN MATCHED THEN UPDATE SET b = s.nb "
                "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (s.k, s.nb)"
            )
            if any(r[0] == key for r in model):
                model = [(r[0], newb) if r[0] == key else r for r in model]
            else:
                model.append((key, newb))
        else:  # merge_del: delete matched, insert sentinel otherwise
            key = arg
            s.sql(
                f"MERGE INTO prop_t t USING (SELECT {key} AS k) s ON t.a = s.k "
                "WHEN MATCHED THEN DELETE "
                "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (s.k, NULL)"
            )
            if any(r[0] == key for r in model):
                model = [r for r in model if r[0] != key]
            else:
                model.append((key, None))

    actual = sorted(
        ((r.a, r.b) for r in s.sql("SELECT a, b FROM prop_t").collect()),
        key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
    )
    expected = sorted(
        model, key=lambda t: (t[0] is None, t[0], t[1] is None, t[1])
    )
    assert actual == expected
