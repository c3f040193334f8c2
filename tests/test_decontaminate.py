"""Benchmark decontamination (operators/dedup.decontaminate)."""

from pyspark.sql import functions as F

from qurious_spark.operators.dedup import decontaminate
from tests.conftest import SF_SMOKE
import pytest


def _docs(spark):
    from qurious_spark.queries import table

    return table(spark, SF_SMOKE, "documents")


@pytest.mark.slow
def test_clean_plus_contaminated_partitions_train(spark):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    clean, contaminated = decontaminate(train, ev, n=5)
    n_train = train.count()
    n_clean = clean.count()
    n_cont = contaminated.count()
    assert n_clean + n_cont == n_train
    # flagged docs really do share a shingle: re-running on the clean set
    # against the same eval flags nothing
    _, again = decontaminate(clean, ev, n=5)
    assert again.count() == 0
    # hit counts are positive
    assert contaminated.filter(F.col("n_hit_grams") < 1).count() == 0


def test_exact_duplicate_of_eval_doc_is_flagged(spark):
    docs = _docs(spark).limit(20)
    ev = docs.filter(F.col("doc_id") < 3)
    dup = ev.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    train = docs.filter(F.col("doc_id") >= 3).unionByName(dup)
    clean, contaminated = decontaminate(train, ev, n=3)
    flagged = {r.doc_id for r in contaminated.collect()}
    assert {r.doc_id for r in dup.collect()} <= flagged


def test_eval_side_broadcasts(spark):
    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    _, contaminated = decontaminate(train, ev, n=13)
    plan = contaminated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
