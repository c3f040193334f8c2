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


def test_srp_keyed_sql_text_form(spark, embeddings):
    """r13 driver-latency pin: the SQL-text _srp_keyed must reproduce the
    pre-r13 Column-based construction bit-for-bit (same ±1 literal planes,
    same HOF fold order, same int->bigint bit packing)."""
    from pyspark.sql import functions as F

    from qurious_spark.functions import vector as V
    from qurious_spark.operators import similarity as S

    planes = S.srp_planes(dim=64, n_tables=8, n_bits=6, seed=42)
    new_df = S._srp_keyed(embeddings, "neighbor_id", planes, "vec_id", "embedding")

    # the exact pre-r13 Column composition, kept here as the reference
    def old_key(vec, table_planes):
        key = F.lit(0).cast("bigint")
        for j, plane in enumerate(table_planes):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            bit = F.when(V.dot(vec, lit_plane) >= 0, F.lit(2 ** j)).otherwise(F.lit(0))
            key = key + bit.cast("bigint")
        return key

    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                old_key(F.col("embedding"), planes[t]).alias("key"),
            )
            for t in range(len(planes))
        ]
    )
    old_df = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.explode(entries).alias("tk")
    ).select("neighbor_id", F.col("tk.t").alias("t"), F.col("tk.key").alias("key"))

    assert new_df.schema == old_df.schema, (new_df.schema, old_df.schema)
    assert sorted(map(tuple, new_df.collect())) == sorted(map(tuple, old_df.collect()))


def test_unrolled_sql_twins(spark, embeddings):
    """r13: the SQL-text twins of the dim-unrolled dot/norm/cosine must be
    bit-identical to the Column compositions they replace (same 0-based
    indexing, cast placement, and left-to-right fold order)."""
    from pyspark.sql import functions as F

    from qurious_spark.functions import vector as V

    dim = 64
    col_form = embeddings.select(
        V.dot(F.col("embedding"), F.col("embedding"), dim).alias("d"),
        V.l2_norm(F.col("embedding"), dim).alias("n"),
        V.cosine(F.col("embedding"), F.col("embedding"), dim).alias("c"),
    )
    sql_form = embeddings.select(
        F.expr(V.dot_unrolled_sql("`embedding`", "`embedding`", dim)).alias("d"),
        F.expr(V.l2_norm_unrolled_sql("`embedding`", dim)).alias("n"),
        F.expr(V.cosine_unrolled_sql("`embedding`", "`embedding`", dim)).alias("c"),
    )
    assert col_form.schema == sql_form.schema
    import struct

    def bits(rows):
        return [
            tuple(struct.pack(">d", v) if isinstance(v, float) else v for v in r)
            for r in rows
        ]

    assert bits(col_form.collect()) == bits(sql_form.collect())
