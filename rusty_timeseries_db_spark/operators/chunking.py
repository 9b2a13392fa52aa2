"""Document chunking — split long documents into overlapping
fixed-token-budget windows, the preprocessing step between a raw
corpus and a context-bounded consumer (training-sequence packing,
embedding models, retrieval indexing). Not a reference operator (the
reference stores numeric telemetry only); this is part of the
LLM-training-pipeline surface (SURVEY §2, LLM-pipeline rows).

Spark-first: the whole transform is JVM-side higher-order functions —
``split`` → ``filter`` → per-row ``sequence`` of chunk ids →
``explode`` → ``slice`` → ``array_join``. No UDF, no shuffle at all:
chunking is embarrassingly row-local, so the plan is a single
WholeStageCodegen map over the corpus scan, and output order is
(input row, chunk_id) — deterministic under any partitioning.

At 100 TB: output size is input × (1 + overlap/stride) — the only
cost is the explode's row multiplication, which pipelines inside the
same stage; no state, no skew surface (a pathological 1 GB document
still produces its chunks inside one task — bound document length
upstream, the same guard the tokenizer needs anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``.

    The final window is the (possibly short) tail; documents at or
    under the budget yield exactly one chunk (id 0), and an empty
    document yields one empty chunk — every input row survives, so
    downstream joins on ``id_cols`` never silently lose documents.

    Output: ``id_cols`` + (chunk_id, chunk_text, n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    # NULL text folds to the empty token array — otherwise size(NULL)
    # is -1 (legacy sizeOfNull) and a NULL doc would emit one chunk
    # with n_tokens = -1, corrupting downstream token sums
    toks = F.coalesce(
        F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0),
        F.array().cast("array<string>"),
    )
    n = F.size("_toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride) + 1
    )
    d = (
        df.withColumn("_toks", toks)
        .withColumn("_nc", n_chunks.cast("long"))
        .select(
            *id_cols,
            "_toks",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)
            ).alias("chunk_id"),
        )
    )
    window = F.slice(
        "_toks", (F.col("chunk_id") * stride + 1).cast("int"), chunk_tokens
    )
    return d.select(
        *id_cols,
        "chunk_id",
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("long").alias("n_tokens"),
    )
