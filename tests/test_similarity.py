"""ANN quality: IVF recall against the exact brute-force baseline."""

from __future__ import annotations

import pytest

from qurious_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    from qurious_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{SF}/embeddings.parquet")


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_recall_vs_bruteforce(spark, embeddings):
    queries = embeddings.limit(20)
    exact = _topk_sets(brute_force_topk(embeddings, queries, k=5).collect())
    approx = _topk_sets(ivf_topk(embeddings, queries, k=5, nprobe=3).collect())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # label-derived coarse buckets with nprobe=3 of ~n_labels buckets: the
    # probed slice must recover most exact neighbors
    assert recall >= 0.6, f"IVF recall@5 too low: {recall:.2f}"


def test_lsh_recall_vs_bruteforce(spark, embeddings):
    queries = embeddings.limit(20)
    exact = _topk_sets(brute_force_topk(embeddings, queries, k=5).collect())
    # few bits at this tiny SF (50 vecs) so buckets actually collide; the
    # sf0.01/sf0.1 oracle run exercises the registry's 8x6 configuration
    approx = _topk_sets(lsh_topk(embeddings, queries, k=5, n_tables=8, n_bits=3).collect())
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.5, f"LSH recall@5 too low: {recall:.2f}"


def test_lsh_candidates_are_reduced(spark, embeddings):
    # a query's candidate set must be a strict subset of the corpus; with
    # b bits per table a bucket holds ~N/2^b vectors, x n_tables tables
    n = embeddings.count()
    queries = embeddings.limit(5)
    res = lsh_topk(embeddings, queries, k=n, n_tables=4, n_bits=4)
    per_query = res.groupBy("query_id").count().collect()
    assert per_query and all(r["count"] < n - 1 for r in per_query)


def test_ivf_probes_fraction_of_corpus(spark, embeddings):
    # the candidate set per query must be a strict subset of the corpus —
    # that reduction is the entire point of IVF at scale
    n_buckets = embeddings.select("label").distinct().count()
    assert n_buckets >= 3  # nprobe=1 below probes ~1/n_buckets of the corpus
    queries = embeddings.limit(5)
    approx = ivf_topk(embeddings, queries, k=5, nprobe=1).collect()
    assert len(approx) > 0


def test_pq_recall_vs_bruteforce(spark, embeddings):
    from qurious_spark.operators.similarity import pq_topk

    queries = embeddings.limit(20)
    exact = _topk_sets(brute_force_topk(embeddings, queries, k=5).collect())
    approx = _topk_sets(
        pq_topk(embeddings, queries, k=5, n_subspaces=16, n_codes=16).collect()
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.5, f"PQ recall@5 too low: {recall:.2f}"


def test_pq_codes_compress(spark, embeddings):
    from qurious_spark.operators.similarity import pq_codebooks

    cb = pq_codebooks(embeddings, n_subspaces=8, n_codes=8, dim=64).collect()
    # 8 subspaces x <=8 codes, centroids are 8-dim
    assert len(cb) <= 64 and len(cb) >= 16
    assert all(len(r.centroid) == 8 for r in cb)
    assert len({(r.s, r.code) for r in cb}) == len(cb)


def test_cosine_pairs_guard_refuses_oversized_input(spark, embeddings):
    import pytest as _pytest

    from qurious_spark.operators.similarity import cosine_pairs

    with _pytest.raises(ValueError, match="O\\(N\\^2\\)"):
        cosine_pairs(embeddings, threshold=0.9, max_rows=5)
    # explicit opt-in above the default still works on bounded data
    small = embeddings.limit(20)
    rows = cosine_pairs(small, threshold=-1.0, max_rows=25).collect()
    assert len(rows) == 20 * 19 // 2


def test_dup_clusters_entry_materializes_expensive_intermediates(spark):
    """The bounded-invariant embedding_dup_clusters references its
    clustering frame three times and its probe edge list twice; without
    eager checkpoints Spark recomputes the O(n^2) pair scan per reference
    (observed 40+ min at sf1, invisible at test scale). Pin that the final
    plan reads the materialized (LogicalRDD) intermediates instead of
    re-deriving them from the parquet scan."""
    import re

    from qurious_spark.queries import ordered_registry

    fn = ordered_registry()["embedding_dup_clusters"]
    df = fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_rdd = len(re.findall(r"LogicalRDD", plan))
    assert n_rdd >= 4, (
        f"expected the cluster/edge references to read checkpointed "
        f"LogicalRDD scans (>=4), found {n_rdd} — a refactor likely "
        f"dropped the localCheckpoint calls; see queries/vector.py"
    )
    # the full-corpus parquet scan must not appear more than twice in the
    # final plan (probe side + corpus side of the edge scorer); more means
    # a cluster reference re-derives the quadratic join from source
    n_scans = len(re.findall(r"embeddings", plan))
    assert n_scans <= 2, f"embeddings source re-derived {n_scans}x in: {plan[:4000]}"
