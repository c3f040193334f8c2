"""Rotating persist: bounded caching for multiply-consumed frames.

Operators that compute an expensive intermediate consumed by two downstream
paths (minhash shingles, LSH band frames, simhash fingerprints, kmeans
centroids) persist it so the work runs once. A bare ``persist()`` with no
owner leaks those blocks for the SparkSession lifetime — every invocation
pins another copy, and across a long session (driver gate + bench loops)
cache occupancy grows monotonically, evicting useful blocks.

``persist_rotating`` bounds that to ONE cached frame per call-site tag per
session: persisting a new frame unpersists the previous one registered
under the same tag. A caller that still holds the *previous* lazy result
recomputes without cache — correct, just uncached — which is the right
trade for unattended long-lived sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: dict[tuple[int, str], DataFrame] = {}


def persist_rotating(df: DataFrame, tag: str) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK), releasing the frame previously
    persisted under ``tag`` for the same SparkSession."""
    from pyspark import StorageLevel

    key = (id(df.sparkSession), tag)
    prev = _REGISTRY.get(key)
    if prev is not None:
        prev.unpersist(blocking=False)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _REGISTRY[key] = out
    return out
