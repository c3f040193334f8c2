"""Property-based coverage for the round-4 prep operators.

Each property replays the operator against a trivial Python model over
randomly generated documents/vectors — the invariants (full token coverage,
exact overlap, quantization error bound, split completeness) must hold for
ANY input, not just the handcrafted fixtures in test_prep_ops.py.

Examples are kept small (Spark job per example); the session fixture is
shared so only the job, not the JVM, is per-example.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qurious_spark.operators.chunking import chunk_documents
from qurious_spark.operators.quantize import quantize_int8
from qurious_spark.operators.splitting import assign_split

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=1, max_size=120
)
_chunk_params = st.tuples(st.integers(2, 40), st.integers(0, 39)).filter(
    lambda p: p[1] < p[0]
)


@settings(**_SETTINGS)
@given(words=_words, params=_chunk_params)
def test_chunking_model_equivalence(spark, words, params):
    chunk_size, overlap = params
    stride = chunk_size - overlap
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_size=chunk_size, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    # Python model: same start arithmetic over the token list
    starts = list(range(0, max(len(words) - overlap, 1), stride))
    expected = [words[s : s + chunk_size] for s in starts]
    assert [r.chunk.split(" ") for r in rows] == expected
    # invariant: concatenating chunks minus overlaps reconstructs the doc
    rebuilt = expected[0][:] if expected else []
    for c in expected[1:]:
        rebuilt.extend(c[overlap:] if len(c) > overlap else [])
    assert rebuilt == words


@settings(**_SETTINGS)
@given(
    vec=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=16
    )
)
def test_quantize_error_bound_and_range(spark, vec):
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = quantize_int8(df).collect()[0]
    assert all(-127 <= c <= 127 for c in r.codes)
    # per-element reconstruction error is at most half a quantization step,
    # so MSE <= (scale/2)^2 (+ fp slack)
    assert r.mse <= (r.scale / 2) ** 2 + 1e-12


@settings(**_SETTINGS)
@given(
    keys=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=50, unique=True),
    w=st.tuples(st.integers(1, 8), st.integers(1, 8), st.integers(1, 8)),
)
def test_split_partitions_the_keyspace(spark, keys, w):
    weights = {"a": w[0], "b": w[1], "c": w[2]}
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = assign_split(df, "k", weights).collect()
    # total function: every key gets exactly one of the declared labels
    assert len(rows) == len(keys)
    assert {r.split for r in rows} <= set(weights)
    # deterministic: a second evaluation agrees exactly
    again = assign_split(df, "k", weights).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
