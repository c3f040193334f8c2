"""Document chunking: split long documents into fixed-size token windows.

The prep step every LLM training pipeline runs before tokenization/packing:
long documents become overlapping chunks of at most ``chunk_size`` tokens
with ``overlap`` tokens shared between consecutive chunks.

Greenfield operator (no reference counterpart — the reference engine,
qurious/src/logical/plan/mod.rs:50-71, has no text surface at all); designed
Spark-first:

- tokenization, window-start generation (``F.sequence``) and slicing
  (``F.slice`` + ``array_join``) are all built-in JVM expressions — no
  Python in the hot path, whole-stage codegen applies end-to-end;
- the explode multiplies rows ~n_tokens/stride per doc, but each output row
  carries only (doc_id, chunk_idx, chunk text) — there is no shuffle at all
  unless the caller adds one downstream, so the operator scales linearly
  with corpus size at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qurious_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split ``text_col`` into overlapping token-window chunks.

    Chunk starts are 1-based token offsets ``1, 1+stride, 1+2*stride, ...``
    with ``stride = chunk_size - overlap``, up to ``max(n_tokens - overlap,
    1)`` so the final chunk still holds at least ``overlap + 1`` tokens
    (empty documents yield one empty chunk). Output columns: the id
    columns, ``chunk_idx`` (0-based), ``chunk`` (space-joined token slice),
    ``n_chunk_tokens``.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    # NULL text behaves like an empty document (one empty chunk) instead of
    # propagating NULL through size() (-1 under legacy sizeOfNull) and the
    # window arithmetic
    toks: Column = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    exploded = docs.select(
        *id_cols,
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start"), chunk_size)
    return exploded.select(
        *id_cols,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
    )
