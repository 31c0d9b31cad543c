"""Document chunking — the pre-tokenization fan-out of a training-data
pipeline: split each document into word-bounded chunks with overlap.

Pure JVM higher-order functions (split → sequence → explode → slice →
concat_ws): the cardinality change happens inside whole-stage codegen with
no Python and no UDF, so the operator scales as a narrow map + explode —
no shuffle at all. Chunk identity (doc_id, chunk_start) is deterministic,
so downstream exact-dedup of chunks and resume are stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_documents(
    docs: DataFrame,
    chunk_words: int = 120,
    stride_words: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, chunk_start, chunk_text, n_chunk_words).

    Chunks of `chunk_words` words starting every `stride_words` words
    (overlap = chunk_words − stride_words). Empty documents yield no rows;
    a trailing partial chunk is kept (training pipelines keep the tail)."""
    if stride_words <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride_words must be positive")

    words = F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )
    d = docs.select(
        F.col(id_col), words.alias("_w"), F.size(words).alias("_n")
    ).filter(F.col("_n") > 0)

    starts = F.sequence(
        F.lit(0), F.col("_n") - 1, F.lit(stride_words)
    )
    return (
        d.select(
            id_col,
            "_w",
            "_n",
            F.explode(starts).alias("chunk_start"),
        )
        .select(
            id_col,
            "chunk_start",
            F.concat_ws(
                " ", F.slice(F.col("_w"), F.col("chunk_start") + 1, chunk_words)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_words), F.col("_n") - F.col("chunk_start")
            ).alias("n_chunk_words"),
        )
    )
