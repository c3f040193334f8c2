"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline; IVF (inverted-file with
coarse centroids) is the scale path: at 100 TB the full cross join is
infeasible, so vectors are bucketed by nearest centroid and queries probe
only the closest ``nprobe`` buckets — turning an O(N*Q) cross join into a
broadcast-join on bucket id over a small candidate slice.

No reference parity here (the reference has no vector surface); greenfield
Spark design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qurious_spark.functions import vector as V


def with_double_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(vec_col, V.as_double(F.col(vec_col)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: queries (small, broadcast) x corpus, ranked.

    Rank is deterministic: (rounded similarity DESC, neighbor id ASC).
    Self-matches are excluded.
    """
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(V.cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection).

    O(N^2) — exactness baseline for correctness checking; use
    ``ivf_topk``/LSH bucketing at corpus scale.
    """
    a = with_double_vec(df, vec_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = with_double_vec(df, vec_col).select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(V.cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ivf_assign(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", label_col: str = "label"
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer from an existing partition column: per-label centroid
    (posexplode + avg per dimension — one shuffle), then each vector assigned
    to its label bucket. Returns (centroids, assigned corpus)."""
    c = with_double_vec(corpus, vec_col)
    cent = (
        c.select(F.col(label_col).alias("bucket"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("bucket", "pos")
        .agg(F.avg("v").alias("cv"))
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pairs"))
        .select("bucket", F.transform("pairs", lambda p: p["cv"]).alias("centroid"))
    )
    return cent, c.withColumn("bucket", F.col(label_col))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest centroid buckets per query, then
    exact-rank within the probed slice. The bucket join replaces the full
    cross join — candidate set shrinks by ~(nprobe / n_buckets)."""
    cent, assigned = ivf_assign(corpus, id_col, vec_col, label_col)
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("bucket"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("csim", V.cosine(F.col("qv"), F.col("centroid")))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qv", "bucket")
    )
    cands = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
        ),
        "bucket",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("sim", F.round(V.cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
