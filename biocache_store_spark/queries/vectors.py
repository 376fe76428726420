"""Similarity-search queries over the embeddings table.

Brute-force cosine scoring as Column expressions (functions/vectors.py) —
the correctness baseline for the ANN variants in operators/similarity.py.
The query vector is joined in via a broadcast of a 1-row DataFrame, so the
same plan shape works for a batch of query vectors at scale (broadcast the
query set, score in one pass over the fact table).

Float32 embeddings are cast to double before any arithmetic so both engines
do the identical double-precision computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.functions.vectors import cosine_similarity
from biocache_store_spark.io import read_table
from biocache_store_spark.queries import register

_QUERY_VEC_ID = 0
_SIM_THRESHOLD = 0.2


@register(
    "embedding_cosine_neighbors",
    doc=(
        "Threshold similarity search: all vectors with cosine >= 0.2 to the "
        "query vector (vec_id=0). One broadcast + one scan; at 100 TB the "
        "broadcast carries the whole query batch."
    ),
    bench=True,
    oracle=f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
        SELECT e.vec_id, e.label,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 4) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {_QUERY_VEC_ID}
          AND list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) >= {_SIM_THRESHOLD}
    """,
)
def embedding_cosine_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").alias("q_emb"))
    )
    sim = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_sim_raw", sim)
        .filter(F.col("cos_sim_raw") >= _SIM_THRESHOLD)
        .select(
            "vec_id",
            "label",
            F.round(F.col("cos_sim_raw"), 4).alias("cos_sim"),
        )
    )


@register(
    "embedding_knn_topk",
    doc=(
        "Brute-force cosine top-k: the correctness baseline for ANN. One "
        "broadcast of the query vector, one scan, TakeOrderedAndProject "
        "for the top-k (no full sort). Deterministic tiebreak on vec_id."
    ),
    bench=True,
    oracle=f"""
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
        SELECT e.vec_id, e.label,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 4) AS cos_sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> {_QUERY_VEC_ID}
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) DESC,
                 e.vec_id ASC
        LIMIT 10
    """,
)
def embedding_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").alias("q_emb"))
    )
    sim = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_sim_raw", sim)
        .orderBy(F.col("cos_sim_raw").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", F.round("cos_sim_raw", 4).alias("cos_sim"))
    )


@register(
    "embedding_ann_topk",
    doc=(
        "LSH-bucketed approximate top-k (operators/similarity.py): "
        "random-hyperplane buckets (deterministic md5-seeded planes), "
        "multi-probe candidate generation, exact-cosine re-rank. The scale "
        "path for similarity search; recall vs the brute-force baseline is "
        "asserted in tests, so the driver check is rows-only."
    ),
    oracle=None,
)
def embedding_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import ann_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return ann_topk(emb, queries, dim=64, k=10)


@register(
    "embedding_label_centroid_norms",
    doc=(
        "Per-label vector statistics: count and mean L2 norm — the grouped "
        "statistics shape (jackknife pre-pass) over vector data; norm is "
        "computed with F.aggregate, JVM-side."
    ),
    oracle="""
        SELECT label,
               COUNT(*) AS n,
               ROUND(AVG(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm
        FROM embeddings GROUP BY label
    """,
)
def embedding_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.functions.vectors import norm

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("nrm", norm(F.col("embedding")))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )
