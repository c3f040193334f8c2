"""Corpus mixing: weighted proportions, determinism, interleave dispersion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qurious_spark.operators.mixing import mix_corpora

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lang_sources(spark):
    from qurious_spark.sources.readers import read_parquet

    docs = read_parquet(spark, f"{SF}/documents.parquet").cache()
    return [
        (docs.filter(F.col("lang") == "en"), 0.6),
        (docs.filter(F.col("lang") == "de"), 0.25),
        (docs.filter(F.col("lang") == "fr"), 0.15),
    ]


def test_mix_proportions_and_determinism(spark, lang_sources):
    target = 80
    mixed = mix_corpora(lang_sources, "doc_id", target, keep_cols=["doc_id", "lang"])
    rows = mixed.collect()
    again = {(r.doc_id, r.src) for r in mix_corpora(
        lang_sources, "doc_id", target, keep_cols=["doc_id", "lang"]
    ).collect()}
    assert {(r.doc_id, r.src) for r in rows} == again  # fully deterministic
    by_src = {}
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0) + 1
    # hash-threshold sampling: each source lands within ~3 binomial sigmas
    # of its quota (small strata have real variance; slots are fixed md5s)
    for i, want in enumerate([48, 20, 12]):
        tol = max(5, 3 * want**0.5)
        assert abs(by_src.get(i, 0) - want) <= tol, (i, by_src)


def test_mix_small_source_fully_included(spark, lang_sources):
    docs_fr, _ = lang_sources[2][0], None
    n_fr = lang_sources[2][0].count()
    # weight so high that fr's quota exceeds its size -> all rows kept
    mixed = mix_corpora(
        [(lang_sources[0][0], 0.01), (lang_sources[2][0], 0.99)],
        "doc_id",
        n_fr * 3,
        keep_cols=["doc_id", "lang"],
    )
    assert mixed.filter(F.col("src") == 1).count() == n_fr


def test_mix_slot_disperses_sources(spark, lang_sources):
    # interleave order must not block sources together: among the first 30
    # by mix_slot, at least two sources appear
    rows = (
        mix_corpora(lang_sources, "doc_id", 80, keep_cols=["doc_id", "lang"])
        .orderBy("mix_slot")
        .limit(30)
        .collect()
    )
    assert len({r.src for r in rows}) >= 2
