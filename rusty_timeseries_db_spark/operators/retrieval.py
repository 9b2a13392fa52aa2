"""Lexical retrieval over a document corpus — BM25 scoring.

The retrieval face of the LLM-data toolbox (SURVEY §2.2 text-analysis
family): dedup finds what's identical, similarity search finds what's
semantically near, BM25 finds what's lexically RELEVANT to a query —
the candidate generator for RAG corpora, eval-set mining, and targeted
decontamination sweeps. No reference analog (main.rs is numeric
telemetry only).

Everything is declarative DataFrame ops on the Okapi BM25 formula
(Robertson & Zaragoza 2009), Lucene's +1 idf flavor so scores stay
non-negative:

    idf(t)    = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d)  = Σ_t idf(t) · tf · (k1 + 1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale shape (the 100 TB story):

- per-doc term frequencies explode ONLY query-matching tokens — the
  token array is HOF-filtered against the (tiny, literal) term set
  BEFORE the explode, so the fan-out is O(matches), not O(corpus
  tokens); non-matching docs contribute zero rows;
- ``N``/``avgdl`` are a 1-row aggregate riding a constant-key
  broadcast equi-join (attach-scalar shape), and the per-term
  document frequencies are a ≤|terms|-row aggregate joined back
  BROADCAST — the "model" (idf table) travels to the data;
- top-k is ``ORDER BY score LIMIT k`` → TakeOrderedAndProject
  (per-partition heaps + a k-row driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    score_decimals: int = 6,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 against ``query_terms``
    (lowercased, matched whole-token). Returns ``(id, n_terms_hit,
    bm25)`` sorted by score descending, ties broken by id — a total
    order, so the selected SET is engine-reproducible and
    oracle-checkable. Scores round at ``score_decimals`` only after
    the final per-doc sum (the summand count is ≤ |terms|, so
    cross-engine summation-order drift stays under the rounding)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    terms_arr = F.array(*[F.lit(t) for t in terms])

    base = df.select(
        F.col(id_col),
        F.size(word_tokens(text_col)).cast("double").alias("_dl"),
        # shrink BEFORE exploding: only query-term occurrences fan out
        F.filter(
            word_tokens(text_col),
            lambda t: F.array_contains(terms_arr, t),
        ).alias("_hits"),
    )
    tf = (
        base.select(id_col, "_dl", F.explode("_hits").alias("_t"))
        .groupBy(id_col, "_dl", "_t")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    # corpus stats: one row, broadcast to the (already small) tf rows
    stats = df.select(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg(F.size(word_tokens(text_col))).alias("_avgdl"),
    )
    from ..queries import attach_scalar

    # per-term document frequency over the matched docs only (a term
    # absent from a doc contributes no tf row, exactly BM25's sum)
    dfreq = tf.groupBy("_t").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = (
        attach_scalar(tf, stats)
        .join(F.broadcast(dfreq), "_t")
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("_tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
            F.round(F.sum("_s"), score_decimals).alias("bm25"),
        )
    )
    return (
        scored.orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "n_terms_hit", "bm25")
    )
