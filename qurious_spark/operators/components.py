"""Connected components + duplicate-cluster resolution.

The missing last step of a near-dup pipeline: pair emitters
(minhash/simhash/cosine — see operators/dedup.py, operators/similarity.py)
produce *edges*; a training-data pipeline needs *clusters* (transitive
closure) and then a canonical-document choice per cluster.

Spark-first design for 100 TB:

- **Alternating large-star / small-star** (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14). Converges in O(log^2 n)
  rounds even on pathological chain graphs, vs O(diameter) for naive label
  propagation. Each round is two groupBy/join shuffles keyed on node id —
  no driver-side graph state, nothing collected.
- Per-round ``localCheckpoint`` truncates the iterative plan lineage (an
  unbounded loop of joins otherwise makes Catalyst re-analyze an
  exponentially growing tree). On a real cluster with a checkpoint dir,
  swap for ``checkpoint()`` to also drop shuffle files.
- Convergence is detected with a constant-size checksum aggregate
  (count + label sum + order-sensitive hash sum), not a full edge-set
  comparison.

The reference engine has no graph/dedup surface; this module is
beyond-reference scope (SURVEY.md §7.2 slice 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from qurious_spark.checkpoint import checkpoint as _checkpoint


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's neighborhood minimum."""
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    selfe = mins.select("u", F.col("m").alias("v"))
    return nbrs.union(selfe).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(node, component)`` for every node appearing in ``pairs``,
    where ``component`` is the smallest node id in the node's component
    (a deterministic, join-friendly cluster key).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .union(pairs.select(F.col(dst).alias("node")))
        .distinct()
    )
    edges = _checkpoint(edges, eager=True)
    prev: tuple | None = None
    for _ in range(max_iterations):
        edges = _checkpoint(_small_star(_large_star(edges)), eager=True)
        chk = tuple(
            edges.agg(
                F.count("*"),
                F.coalesce(F.sum(F.col("u") + F.col("v")), F.lit(0)),
                F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)),
            ).first()
        )
        if chk == prev:
            break
        prev = chk
    sym = _symmetrize(edges)
    comp = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("node"), F.least("u", "mn").alias("component"))
    )
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def duplicate_clusters(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """``(node, component, cluster_size)`` for every paired document."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "component").select("node", "component", "cluster_size")


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop every document except the smallest-id member of each duplicate
    cluster. Documents in no pair are kept untouched.

    The anti-join key set (non-canonical members) is proportional to the
    duplicate count, not the corpus — typically small enough for AQE to
    broadcast; the corpus side is never shuffled otherwise.
    """
    cc = connected_components(pairs, src, dst)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
