"""Deterministic stratified sampling: reproducibility, nestedness, exact-k."""

from pyspark.sql import functions as F

from qurious_spark.operators import sampling as SA


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_hash_sample_deterministic_and_nested(session):
    docs = session.spark.table("documents")
    s10 = _ids(SA.stratified_sample_hash(docs, "source", "doc_id", 10))
    s10_again = _ids(SA.stratified_sample_hash(docs, "source", "doc_id", 10))
    s20 = _ids(SA.stratified_sample_hash(docs, "source", "doc_id", 20))
    assert s10 == s10_again
    assert set(s10) <= set(s20)  # nested threshold family
    assert 0 < len(s10) < docs.count()


def test_hash_sample_sizes_near_target(session):
    docs = session.spark.table("documents")
    got = (
        SA.stratified_sample_hash(docs, "source", "doc_id", 15)
        .groupBy("source")
        .count()
        .collect()
    )
    strata = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    for r in got:
        cap = min(15, strata[r["source"]])
        # binomial jitter around the target, never above the stratum size
        assert 0 < r["count"] <= strata[r["source"]]
        assert abs(r["count"] - cap) <= max(10, cap)


def test_topk_exact_counts(session):
    docs = session.spark.table("documents")
    per = (
        SA.stratified_topk_exact(docs, "source", "doc_id", 7)
        .groupBy("source")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    strata = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert per and all(r["c"] == min(7, strata[r["source"]]) for r in per)


def test_topk_deterministic(session):
    docs = session.spark.table("documents")
    a = _ids(SA.stratified_topk_exact(docs, "source", "doc_id", 3))
    b = _ids(SA.stratified_topk_exact(docs, "source", "doc_id", 3))
    assert a == b and len(a) > 0
