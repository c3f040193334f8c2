"""Empty-input regression guard: a representative entry per family must
return an empty (or scalar-default) result on 0-row tables, not raise.

The full 189-entry sweep is `python tools/empty_sweep.py` (~8 min; run
before release); this subset keeps the regression surface in the default
suite at ~1 minute. 187/189 passed the full sweep when introduced — the
two exceptions are the schemaless-NDJSON guard (EXPECTED_RAISES there)
and mix_corpora, fixed to yield an empty mixture.
"""

from __future__ import annotations

import pytest

SUBSET = [
    "tpch_q1",  # no-grouping + grouped aggregates
    "tpch_q18",  # join + HAVING + top-n
    "window_rank_dense",
    "agg_basic",
    "subquery_suite",
    "dedup_exact",
    "dedup_minhash_pairs",
    "ann_lsh_topk",
    "embedding_semdedup",
    "pipeline_mix_corpora",  # the sweep's one fixed crash
    "pipeline_pack_bins",
    "pipeline_training_data",
    "text_winnow_fingerprints",
    "events_funnel",
    "sketch_hll_rollup",
]


@pytest.fixture(scope="module")
def empty_sf(spark):
    from tools.empty_sweep import build_empty_dataset

    return build_empty_dataset(spark, "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", SUBSET)
def test_entry_handles_empty_input(spark, empty_sf, name):
    from qurious_spark.queries import REGISTRY, ordered_registry

    ordered_registry()  # populate the lazy registry
    rows = REGISTRY[name](spark, empty_sf).collect()
    assert isinstance(rows, list)  # any result is fine; raising is the bug
