"""Connected components / duplicate-cluster resolution.

Oracle is a plain-Python union-find over the same edge list; graphs include
the chain worst case (where naive label propagation needs O(n) rounds but
large-star/small-star needs O(log^2 n))."""

import random

import pytest
from pyspark.sql import functions as F

from qurious_spark.operators.components import (
    connected_components,
    duplicate_clusters,
    resolve_duplicates,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min member id
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "id_a bigint, id_b bigint"
    )


def _check(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    expected = _union_find(nodes, edges)
    got = {
        r["node"]: r["component"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == expected


@pytest.mark.slow
def test_chain_worst_case(spark):
    _check(spark, [(i, i + 1) for i in range(40)])


def test_two_cliques_and_bridge_free_pair(spark):
    clique1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    _check(spark, clique1 + clique2 + [(100, 200)])


@pytest.mark.slow
def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        _check(spark, edges)


def test_empty_pairs(spark):
    df = _pairs_df(spark, []).limit(0)
    assert connected_components(df).count() == 0


def test_duplicate_clusters_sizes(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    rows = {
        r["node"]: (r["component"], r["cluster_size"])
        for r in duplicate_clusters(_pairs_df(spark, edges)).collect()
    }
    assert rows == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        10: (10, 2),
        11: (10, 2),
    }


def test_resolve_duplicates_keeps_canonical_and_unpaired(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = _pairs_df(spark, [(1, 2), (2, 4)])
    kept = sorted(
        r["doc_id"] for r in resolve_duplicates(docs, pairs).collect()
    )
    # cluster {1,2,4} -> keep 1; 0,3,5 unpaired -> kept
    assert kept == [0, 1, 3, 5]
