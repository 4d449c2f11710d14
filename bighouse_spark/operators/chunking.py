"""Document chunking — split long documents into overlapping
token-window chunks (the context-window prep step of an LLM training
pipeline; the reference has no analog, this is a training-data
extension op per the build brief).

Chunk ``i`` covers whitespace tokens ``[i*stride, i*stride + size)``
with ``stride = size - overlap``; the final chunk may be short. A doc
with ``<= size`` tokens yields exactly one chunk (itself).

Scale shape: pure narrow map + explode at the scan — ``split`` /
``sequence`` / ``slice`` / ``array_join`` are all JVM expressions
inside whole-stage codegen, no Python, no shuffle. At 100 TB chunking
is scan-bound; output row count is ~``total_tokens / stride``, so
size the downstream ``spark.sql.files.maxPartitionBytes`` for the
~``size/stride``× row amplification, not the input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    size: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    keep_text: bool = False,
) -> DataFrame:
    """Explode each document into overlapping token chunks.

    Adds ``chunk_id`` (0-based), ``n_chunk_tokens``, ``chunk_md5``
    (content hash — lets equality checks avoid shipping chunk text),
    and, when ``keep_text``, the ``chunk_text`` itself.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks: Column = (
        F.when(n <= size, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(size)).cast("double") / F.lit(stride)) + 1
        )
        .cast("int")
    )
    chunk_toks = F.slice(
        F.col("__bh_toks"), F.col("chunk_id") * stride + 1, size
    )
    out = (
        df.withColumn("__bh_toks", toks)
        .withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("int"))
        .withColumn("__bh_chunk", chunk_toks)
        .withColumn("n_chunk_tokens", F.size("__bh_chunk"))
        .withColumn("chunk_md5", F.md5(F.array_join("__bh_chunk", " ")))
    )
    if keep_text:
        out = out.withColumn("chunk_text", F.array_join("__bh_chunk", " "))
    return out.drop("__bh_toks", "__bh_chunk")
