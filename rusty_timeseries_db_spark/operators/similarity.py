"""Similarity search over an embedding column (north-star mandated).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Scale envelope: queries × corpus dot products; fine when the *query*
  set is small (broadcast) even if the corpus is huge, because the
  corpus is scanned once, partition-parallel, with TakeOrdered per query.
- ``lsh_cosine_topk``: random-hyperplane (sign) LSH bucketing — the
  scale path. Hyperplanes are generated deterministically on the driver
  (seeded), shipped as literals; candidates come from an equi-join on
  bucket keys (multi-probe over H tables), then exact cosine rerank.

All vector math is JVM-side (functions/vectors.py).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector by cosine.

    The query side is broadcast — the corpus never shuffles; ranking is
    a window over the (small) per-query candidate set.
    Returns (query_id, vec_id, cos_sim, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
    )
    scored = corpus.crossJoin(q).select(
        F.col("_qid").alias(query_id),
        F.col(corpus_id).alias(corpus_id),
        cosine(F.col(corpus_vec), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    """Deterministic Gaussian hyperplanes, driver-side (no numpy needed
    on executors; shipped as literal arrays)."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket key for one LSH table: bit_i = 1[v·p_i > 0]."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing an LSH bucket
    with the query in ≥1 of ``n_tables`` tables; exact cosine rerank.

    Shuffle profile: corpus is scanned once per plan, bucket keys are
    computed map-side, and the candidate join is an equi-join on
    (table, bucket) — no all-pairs work. Recall is tunable via
    n_planes/n_tables.
    """
    tables = _hyperplanes(dim, n_planes, n_tables, seed)

    def with_buckets(df: DataFrame, id_col: str, vec_alias: str, id_alias: str) -> DataFrame:
        keyed = df.select(
            F.col(id_col).alias(id_alias), F.col(vec_alias).alias(f"_{id_alias}_vec")
        )
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_bucket_col(F.col(f"_{id_alias}_vec"), tables[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return keyed.select(
            id_alias, f"_{id_alias}_vec", F.explode(buckets).alias("_b")
        ).select(id_alias, f"_{id_alias}_vec", "_b.table", "_b.bucket")

    c = with_buckets(corpus.select(F.col(corpus_id), F.col(corpus_vec)), corpus_id, corpus_vec, "_cid")
    q = F.broadcast(
        with_buckets(queries.select(F.col(query_id), F.col(query_vec)), query_id, query_vec, "_qid")
    )
    cand = (
        c.join(q, ["table", "bucket"])
        .select("_qid", "_cid", "__cid_vec", "__qid_vec")
        .dropDuplicates(["_qid", "_cid"])
    )
    scored = cand.select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        cosine(F.col("__cid_vec"), F.col("__qid_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: candidates from
    shared LSH buckets (equi-join, never all-pairs), exact cosine
    rerank, threshold filter. Returns (id_a, id_b, cos_sim), id_a<id_b.

    Recall is tunable via (n_planes, n_tables); the exact all-pairs
    baseline (q_embedding_neardup_exact) is the correctness oracle."""
    tables = _hyperplanes(dim, n_planes, n_tables, seed)
    keyed = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket_col(F.col("_vec"), tables[t]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    banded = keyed.select("_id", "_vec", F.explode(buckets).alias("_b")).select(
        "_id", "_vec", "_b.table", "_b.bucket"
    )
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_vec").alias("_va"), "table", "bucket"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"), "table", "bucket"
    )
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    from ..functions.vectors import cosine as _cos

    return (
        cand.select("id_a", "id_b", _cos(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    partitions the corpus into ``n_clusters`` cells; each query probes
    its ``n_probe`` nearest centroids and reranks exactly within them.

    Scale shape: the corpus is scanned once to assign cells (narrow
    after the fitted model broadcast); the candidate join is an
    equi-join on cell id touching ~n_probe/n_clusters of the corpus per
    query. Better suited than sign-LSH when similarity thresholds are
    moderate or data is clustered (see SCALE.md).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cvec")
    ).withColumn("_fv", array_to_vector(F.col("_cvec").cast("array<double>")))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_fv", predictionCol="_cell")
    model = km.fit(c)
    assigned = model.transform(c).select("_cid", "_cvec", "_cell")

    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]

    def dist2(vec_col, ctr: list[float]):
        arr = F.array(*[F.lit(x) for x in ctr])
        return F.aggregate(
            F.zip_with(vec_col, arr, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
    )
    # per-query centroid distances → probe the n_probe nearest cells
    cells = F.array(
        *[
            F.struct(dist2(F.col("_qvec"), ctr).alias("d"), F.lit(i).alias("cell"))
            for i, ctr in enumerate(centroids)
        ]
    )
    probed = q.select(
        "_qid",
        "_qvec",
        F.explode(F.slice(F.array_sort(cells), 1, n_probe)).alias("_p"),
    ).select("_qid", "_qvec", F.col("_p.cell").alias("_cell"))

    cand = assigned.join(F.broadcast(probed), "_cell")
    scored = cand.select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        cosine(F.col("_cvec"), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
