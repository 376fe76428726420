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

from biocache_store_spark.functions.vectors import (
    cosine_similarity_arrow,
    cosine_similarity_arrow_once,
)
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
    # _once variant: the threshold filter consumes the UDF column, which
    # otherwise duplicates ArrowEvalPython (every row scored twice)
    sim = cosine_similarity_arrow_once(F.col("embedding"), F.col("q_emb"))
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
    sim = cosine_similarity_arrow(F.col("embedding"), F.col("q_emb"))
    return (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cos_sim_raw", sim)
        .orderBy(F.col("cos_sim_raw").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", F.round("cos_sim_raw", 4).alias("cos_sim"))
    )


def _ann_oracle(dim: int = 64, n_planes: int = 8, k: int = 10) -> str:
    """Exact DuckDB replay of the LSH pipeline: the hyperplanes are
    md5-deterministic Python literals baked into the Spark plan, so the same
    literals are baked into the SQL; buckets, 1-bit-flip probes, and the
    cosine re-rank are then ordinary SQL."""
    from biocache_store_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    bits = "\n            || ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ",".join(repr(v) for v in plane)
        + "]::DOUBLE[]) > 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {bits} AS bucket
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS query_id, embedding AS q_emb, bucket AS qbucket
            FROM b WHERE vec_id < 5
        ),
        probes AS (
            SELECT query_id, q_emb,
                   CASE WHEN i = 0 THEN qbucket
                        ELSE substr(qbucket, 1, i - 1)
                             || (CASE WHEN substr(qbucket, i, 1) = '1'
                                 THEN '0' ELSE '1' END)
                             || substr(qbucket, i + 1)
                   END AS bucket
            FROM q, generate_series(0, {n_planes}) t(i)
        ),
        cand AS (
            SELECT p.query_id, b.vec_id,
                   list_cosine_similarity(b.embedding::DOUBLE[], p.q_emb::DOUBLE[]) AS cs
            FROM b JOIN probes p USING (bucket)
            WHERE b.vec_id <> p.query_id
        )
        SELECT query_id, vec_id, ROUND(cs, 4) AS cos_sim,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS rnk
              FROM cand)
        WHERE rnk <= {k}
    """


@register(
    "embedding_ann_topk",
    doc=(
        "LSH-bucketed approximate top-k (operators/similarity.py): "
        "random-hyperplane buckets (deterministic md5-seeded planes), "
        "multi-probe candidate generation, exact-cosine re-rank. The scale "
        "path for similarity search; the md5-seeded planes make the whole "
        "pipeline exactly reproducible in the DuckDB oracle (plane literals "
        "baked into the SQL), and recall vs the brute-force baseline is "
        "additionally asserted in tests."
    ),
    oracle=_ann_oracle(),
)
def embedding_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import ann_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return ann_topk(emb, queries, dim=64, k=10)


_IVF_CELLS = 16
_IVF_NPROBE = 2
_IVF_K = 10


def _ivf_oracle() -> str:
    """Exact DuckDB replay of the IVF pipeline: centroids are the first
    {cells} corpus vectors (the externally-supplied-centroid shape), so
    assignment (argmax cosine, ties to lowest cell), nprobe probing, and
    the exact-cosine re-rank are ordinary SQL."""
    return f"""
        WITH cents AS (
            SELECT vec_id AS cell_id, embedding AS centroid
            FROM embeddings WHERE vec_id < {_IVF_CELLS}
        ),
        assigned AS (
            SELECT vec_id, embedding, cell_id FROM (
                SELECT e.vec_id, e.embedding, c.cell_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM embeddings e, cents c
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT query_id, q_emb, cell_id FROM (
                SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cell_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               q.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM embeddings q, cents c
                WHERE q.vec_id < 5
            ) WHERE rn <= {_IVF_NPROBE}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id,
                   list_cosine_similarity(a.embedding::DOUBLE[], p.q_emb::DOUBLE[]) AS cs
            FROM assigned a JOIN probes p USING (cell_id)
            WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, vec_id, ROUND(cs, 4) AS cos_sim,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY cs DESC, vec_id ASC) AS rnk
              FROM cand)
        WHERE rnk <= {_IVF_K}
    """


@register(
    "embedding_ivf_topk",
    doc=(
        "IVF approximate top-k (operators/similarity.py ivf_assign/"
        "ivf_topk): coarse-quantizer cells from externally supplied "
        "centroids (here: the first 16 corpus vectors, the deterministic "
        "stand-in for an offline k-means pass), nprobe=2 probing, "
        "exact-cosine re-rank — the second scale path for similarity "
        "search alongside the hyperplane-LSH ann_topk. Assignment is a "
        "broadcast argmax (index build never shuffles the corpus); at "
        "100 TB the assigned table partitions by cell_id so query batches "
        "prune their scans to the probed cells."
    ),
    oracle=_ivf_oracle(),
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, centroids, k=_IVF_K, nprobe=_IVF_NPROBE)


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
    from biocache_store_spark.functions.vectors import norm_arrow

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("nrm", norm_arrow(F.col("embedding")))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )


def _near_dup_oracle(dim: int = 64, n_planes: int = 4, threshold: float = 0.25) -> str:
    """Exact DuckDB replay of the LSH near-dup pipeline (same technique as
    _ann_oracle: the md5-derived plane literals are baked into the SQL)."""
    from biocache_store_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    bits = "\n            || ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ",".join(repr(v) for v in plane)
        + "]::DOUBLE[]) > 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {bits} AS bucket
            FROM embeddings
        ),
        capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS n
                FROM b
            ) WHERE n <= 100000
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]), 4)
                 AS cos_sim
        FROM capped a JOIN capped c
          ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                     c.embedding::DOUBLE[]) >= {threshold}
    """


@register(
    "embedding_cosine_near_dup",
    doc=(
        "Embedding-cosine near-duplicate pairs "
        "(operators/similarity.py cosine_near_duplicates): the dedup-family "
        "member for embedding columns — random-hyperplane LSH buckets bound "
        "candidate generation (never all-pairs), a bucket-size cap guards "
        "hot clusters, exact cosine filters within buckets. md5-seeded "
        "planes make the result exactly SQL-reproducible. Threshold 0.25 "
        "because the synthetic embeddings' max pairwise cosine is ~0.51 — "
        "on a real near-dup corpus this would be ~0.95."
    ),
    oracle=_near_dup_oracle(),
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import cosine_near_duplicates

    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_near_duplicates(emb, dim=64, threshold=0.25, n_planes=4)


@register(
    "embedding_quantize",
    doc=(
        "Int8 scalar quantization of the embedding column — the vector "
        "compression pass run before building an ANN index at corpus "
        "scale (4x smaller vectors, cheaper distance kernels). Per "
        "dimension: min/max over the corpus (a DIM-sized stats relation, "
        "broadcast), q = floor((x-min)/(max-min)*255 + 0.5) — floor(v+.5) "
        "instead of round() because the two engines' round-half rules "
        "could differ on exact .5 doubles while floor is identical given "
        "identical inputs. Output per vector: the quantized checksum, "
        "max reconstruction error, and dimension count. Quantization is "
        "map-side after the broadcast; one shuffle for the per-dim stats, "
        "one for the per-vector rollup."
    ),
    oracle="""
        WITH ex AS (
            SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
            FROM (SELECT vec_id, embedding,
                         unnest(generate_series(1, len(embedding))) AS i
                  FROM embeddings)
        ),
        stats AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY i),
        q AS (
            SELECT e.vec_id, e.x, s.mn, s.mx,
                   CASE WHEN s.mx = s.mn THEN 0
                        ELSE CAST(FLOOR((e.x - s.mn) / (s.mx - s.mn) * 255 + 0.5)
                                  AS BIGINT) END AS qv
            FROM ex e JOIN stats s USING (i)
        ),
        r AS (
            SELECT vec_id, qv,
                   CASE WHEN mx = mn THEN mn
                        ELSE mn + (qv * (mx - mn)) / 255 END AS recon,
                   x
            FROM q
        )
        SELECT vec_id, CAST(SUM(qv) AS BIGINT) AS q_sum,
               ROUND(MAX(ABS(x - recon)), 6) AS max_err,
               COUNT(*) AS n_dims
        FROM r GROUP BY vec_id
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", "i", F.col("xf").cast("double").alias("x"))
    stats = ex.groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    joined = ex.join(F.broadcast(stats), "i")
    qv = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
        F.floor(
            (F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255 + 0.5
        ).cast("long")
    )
    q = joined.withColumn("qv", qv)
    recon = F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
        F.col("mn") + (F.col("qv") * (F.col("mx") - F.col("mn"))) / F.lit(255)
    )
    r = q.withColumn("recon", recon)
    return r.groupBy("vec_id").agg(
        F.sum("qv").alias("q_sum"),
        F.round(F.max(F.abs(F.col("x") - F.col("recon"))), 6).alias("max_err"),
        F.count(F.lit(1)).alias("n_dims"),
    )


_SEMDEDUP_THRESHOLD = 0.5


@register(
    "semantic_dedup",
    doc=(
        "SemDeDup semantic deduplication (operators/similarity.py "
        "semantic_dedup): vectors are assigned to nearest-centroid IVF "
        "cells (centroids: the first 16 corpus vectors, the deterministic "
        "stand-in for an offline k-means pass) and within each cell any "
        "vector with a lower-id cell-mate at cosine >= 0.5 is pruned — "
        "the embedding-space dedup pass that catches paraphrases exact "
        "and MinHash dedup miss. Clustering first keeps the pairwise "
        "stage cell-quadratic, never corpus-quadratic; at 100 TB the "
        "cell count grows with the corpus and oversized cells are "
        "dropped, not joined. Output is the per-vector pruning decision."
    ),
    oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cell_id, embedding AS centroid
            FROM embeddings WHERE vec_id < {_IVF_CELLS}
        ),
        assigned AS (
            SELECT vec_id, embedding, cell_id FROM (
                SELECT e.vec_id, e.embedding, c.cell_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM embeddings e, cents c
            ) WHERE rn = 1
        ),
        pruned AS (
            SELECT DISTINCT b.vec_id
            FROM assigned a JOIN assigned b
              ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {_SEMDEDUP_THRESHOLD}
        )
        SELECT a.vec_id, a.cell_id, (p.vec_id IS NULL) AS keep
        FROM assigned a LEFT JOIN pruned p ON a.vec_id = p.vec_id
    """,
)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    return semantic_dedup(emb, centroids, threshold=_SEMDEDUP_THRESHOLD)


_PQ_SUBSPACES = 8
_PQ_DS = 8  # dims per subspace (64 / 8)


def _pq_dist_sql(e: str, c: str, s: str) -> str:
    """Squared-L2 between subspace `s` slices of two DuckDB lists, written
    as an explicit left-associative 8-term chain so the addition order is
    the one pq_encode/pq_topk use — engine-exact doubles."""
    terms = []
    for i in range(1, _PQ_DS + 1):
        t = f"({e}[{s}*{_PQ_DS}+{i}]::DOUBLE - {c}[{s}*{_PQ_DS}+{i}]::DOUBLE)"
        terms.append(f"{t} * {t}")
    return " + ".join(terms)


@register(
    "embedding_pq_topk",
    doc=(
        "Product-quantization top-k via asymmetric distance "
        "(operators/similarity.py pq_encode/pq_topk — Jegou et al. PQ): "
        "embeddings are encoded to 8 codeword indices (per-subspace "
        "argmin-L2 against the first-16-vector codebook, the "
        "deterministic stand-in for per-subspace k-means) and the query "
        "scores candidates by summing 8 table lookups — the ~32x-"
        "compressed index that keeps a 100 TB embedding corpus scannable "
        "in memory. Encoding is one mapInPandas pass (codebook collected "
        "once — it is a dimension); scoring is a pure JVM expression over "
        "the int codes with the 8x16 distance table as a plan literal; "
        "top-k is TakeOrderedAndProject. All distances accumulate left-"
        "to-right, so the approximate scores are engine-exact."
    ),
    oracle=f"""
        WITH cents AS (
            SELECT vec_id AS j, embedding FROM embeddings WHERE vec_id < 16
        ),
        sub AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
        enc AS (
            SELECT vec_id, s, j FROM (
                SELECT e.vec_id, sub.s, c.j,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id, sub.s
                           ORDER BY {_pq_dist_sql('e.embedding', 'c.embedding', 'sub.s')} ASC,
                                    c.j ASC) AS rn
                FROM embeddings e CROSS JOIN sub CROSS JOIN cents c
                WHERE e.vec_id <> {_QUERY_VEC_ID}
            ) WHERE rn = 1
        ),
        qt AS (
            SELECT sub.s, c.j,
                   {_pq_dist_sql('q.embedding', 'c.embedding', 'sub.s')} AS t
            FROM (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}) q
            CROSS JOIN sub CROSS JOIN cents c
        ),
        joined AS (SELECT enc.vec_id, enc.s, qt.t FROM enc JOIN qt USING (s, j)),
        piv AS (
            SELECT vec_id,
                   {", ".join(f"MAX(CASE WHEN s={s} THEN t END) AS t{s}" for s in range(_PQ_SUBSPACES))}
            FROM joined GROUP BY vec_id
        ),
        scored AS (
            SELECT vec_id, {" + ".join(f"t{s}" for s in range(_PQ_SUBSPACES))} AS approx
            FROM piv
        )
        SELECT vec_id, ROUND(approx, 6) AS approx_dist,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY approx ASC, vec_id ASC) AS rnk
              FROM scored)
        WHERE rnk <= {_IVF_K}
    """,
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import pq_encode, pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    codebook = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    encoded = pq_encode(
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select("vec_id", "embedding"),
        codebook,
        n_subspaces=_PQ_SUBSPACES,
    )
    # 1-row collect of the query vector + the small codebook dim — the
    # accepted driver-side materializations (cf. BM25 global stats)
    qvec = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").collect()[0][0]
    book = [
        r["embedding"]
        for r in sorted(codebook.collect(), key=lambda r: r["j"])
    ]
    return pq_topk(encoded, qvec, book, k=_IVF_K, n_subspaces=_PQ_SUBSPACES)


_IVFPQ_CELLS = 4
_IVFPQ_BOOK_LO = 4
_IVFPQ_BOOK_HI = 20


def _pq_resid_dist_sql(e: str, cent: str, cb: str, s: str) -> str:
    """Squared-L2 between subspace `s` slices of a RESIDUAL (e − cent)
    and a codeword, as the explicit left-associative chain
    pq_encode_residual / ivfpq_topk use — engine-exact doubles."""
    terms = []
    for i in range(1, _PQ_DS + 1):
        idx = f"{s}*{_PQ_DS}+{i}"
        t = (
            f"(({e}[{idx}]::DOUBLE - {cent}[{idx}]::DOUBLE)"
            f" - {cb}[{idx}]::DOUBLE)"
        )
        terms.append(f"{t} * {t}")
    return " + ".join(terms)


def _ivfpq_single_query_ctes() -> str:
    """The CTE chain shared by the single-query IVFADC oracles
    (embedding_ivfpq_topk and embedding_ivfpq_rerank): assignment,
    residual encoding, probing, ADC table and the per-candidate summed
    `scored(vec_id, approx)` relation — all with the same
    left-associative double chains the engine uses."""
    return f"""
        WITH cents AS (
            SELECT vec_id AS cell_id, embedding AS centroid
            FROM embeddings WHERE vec_id < {_IVFPQ_CELLS}
        ),
        book AS (
            SELECT vec_id AS j, embedding AS cw
            FROM embeddings
            WHERE vec_id >= {_IVFPQ_BOOK_LO} AND vec_id < {_IVFPQ_BOOK_HI}
        ),
        assigned AS (
            SELECT vec_id, embedding, cell_id, centroid FROM (
                SELECT e.vec_id, e.embedding, c.cell_id, c.centroid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM embeddings e, cents c
                WHERE e.vec_id <> {_QUERY_VEC_ID}
            ) WHERE rn = 1
        ),
        sub AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
        enc AS (
            SELECT vec_id, cell_id, s, j FROM (
                SELECT a.vec_id, a.cell_id, sub.s, b.j,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.vec_id, sub.s
                           ORDER BY {_pq_resid_dist_sql('a.embedding', 'a.centroid', 'b.cw', 'sub.s')} ASC,
                                    b.j ASC) AS rn
                FROM assigned a CROSS JOIN sub CROSS JOIN book b
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT cell_id, centroid FROM (
                SELECT c.cell_id, c.centroid,
                       ROW_NUMBER() OVER (
                           ORDER BY list_cosine_similarity(
                               q.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM (SELECT embedding FROM embeddings
                      WHERE vec_id = {_QUERY_VEC_ID}) q, cents c
            ) WHERE rn <= {_IVF_NPROBE}
        ),
        qt AS (
            SELECT p.cell_id, sub.s, b.j,
                   {_pq_resid_dist_sql('q.embedding', 'p.centroid', 'b.cw', 'sub.s')} AS t
            FROM (SELECT embedding FROM embeddings
                  WHERE vec_id = {_QUERY_VEC_ID}) q
            CROSS JOIN probes p CROSS JOIN sub CROSS JOIN book b
        ),
        joined AS (
            SELECT enc.vec_id, enc.s, qt.t
            FROM enc JOIN qt
              ON qt.cell_id = enc.cell_id AND qt.s = enc.s AND qt.j = enc.j
        ),
        piv AS (
            SELECT vec_id,
                   {", ".join(f"MAX(CASE WHEN s={s} THEN t END) AS t{s}" for s in range(_PQ_SUBSPACES))}
            FROM joined GROUP BY vec_id
        ),
        scored AS (
            SELECT vec_id, {" + ".join(f"t{s}" for s in range(_PQ_SUBSPACES))} AS approx
            FROM piv
        )
    """


@register(
    "embedding_ivfpq_topk",
    doc=(
        "IVFADC top-k (operators/similarity.py pq_encode_residual/"
        "ivfpq_topk — Jegou et al. §IV): vectors are assigned to IVF "
        "cells (argmax cosine, first-4-vector centroids as the "
        "deterministic stand-in) and product-quantized on the RESIDUAL "
        "v - centroid[cell]; the query probes its nprobe=2 nearest "
        "cells, builds one ADC table per cell from its per-cell "
        "residual, and scores candidates via a cell-dispatched "
        "when-chain of table lookups — pure JVM expressions, top-k as "
        "TakeOrderedAndProject. Residual encoding is what keeps PQ "
        "usable at density: standalone PQ ties all members of a tight "
        "cell on identical codes (recall@10 0.105 at 1M, SCALE.md). "
        "The oracle replays assignment, residual encoding, probing and "
        "the ADC sums in SQL with the same left-associative chains."
    ),
    oracle=_ivfpq_single_query_ctes() + f"""
        SELECT vec_id, ROUND(approx, 6) AS approx_dist,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY approx ASC, vec_id ASC) AS rnk
              FROM scored)
        WHERE rnk <= {_IVF_K}
    """,
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk,
        pq_encode_residual,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < _IVFPQ_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter(
        (F.col("vec_id") >= _IVFPQ_BOOK_LO) & (F.col("vec_id") < _IVFPQ_BOOK_HI)
    ).select(F.col("vec_id").alias("j"), "embedding")
    encoded = pq_encode_residual(
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select("vec_id", "embedding"),
        cents,
        book,
        n_subspaces=_PQ_SUBSPACES,
    )
    # 1-row query vector + the two small dims — accepted driver-side
    # materializations (cf. embedding_pq_topk)
    qvec = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select("embedding").collect()[0][0]
    )
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    return ivfpq_topk(
        encoded, qvec, cent_rows, book_rows,
        k=_IVF_K, nprobe=_IVF_NPROBE, n_subspaces=_PQ_SUBSPACES,
    )


_IVFPQ_SHORTLIST = 20


@register(
    "embedding_ivfpq_rerank",
    doc=(
        "IVFADC + exact re-rank (operators/similarity.py "
        "ivfpq_topk_rerank — Jegou et al. §V-A 'IVFADC+R'): the ADC "
        "stage prunes the probed cells to a top-20 shortlist from the "
        "int codes alone, the shortlist is broadcast back onto the raw "
        "vectors, and the final top-10 ranks by EXACT cosine (DESC, id "
        "ASC — the LSH/IVF in-plan re-rank tie-break). This is the "
        "production recipe whose recall the ANN ladder pins (SCALE.md "
        "'ANN recall': re-rank lifted 1M recall@10 0.28 -> 0.735), now "
        "reachable through the engine surface. The oracle replays the "
        "full chain: assignment, residual encoding, probing, ADC sums, "
        "shortlist cut, exact-cosine re-rank."
    ),
    oracle=_ivfpq_single_query_ctes() + f"""
        , short AS (
            SELECT vec_id FROM (
                SELECT vec_id, ROW_NUMBER() OVER (
                    ORDER BY approx ASC, vec_id ASC) AS srnk
                FROM scored)
            WHERE srnk <= {_IVFPQ_SHORTLIST}
        ),
        rr AS (
            SELECT s.vec_id,
                   list_cosine_similarity(e.embedding::DOUBLE[],
                                          q.embedding::DOUBLE[]) AS cs
            FROM short s
            JOIN embeddings e ON e.vec_id = s.vec_id
            CROSS JOIN (SELECT embedding FROM embeddings
                        WHERE vec_id = {_QUERY_VEC_ID}) q
        )
        SELECT vec_id, ROUND(cs, 4) AS cos_sim,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id ASC) AS rnk
              FROM rr)
        WHERE rnk <= {_IVF_K}
    """,
)
def embedding_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_rerank,
        pq_encode_residual,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < _IVFPQ_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter(
        (F.col("vec_id") >= _IVFPQ_BOOK_LO) & (F.col("vec_id") < _IVFPQ_BOOK_HI)
    ).select(F.col("vec_id").alias("j"), "embedding")
    body = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).select(
        "vec_id", "embedding"
    )
    encoded = pq_encode_residual(body, cents, book, n_subspaces=_PQ_SUBSPACES)
    qvec = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select("embedding").collect()[0][0]
    )
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    return ivfpq_topk_rerank(
        encoded, body, qvec, cent_rows, book_rows,
        k=_IVF_K, shortlist=_IVFPQ_SHORTLIST, nprobe=_IVF_NPROBE,
        n_subspaces=_PQ_SUBSPACES,
    )


@register(
    "embedding_ivfpq_batch",
    doc=(
        "Batch IVFADC top-k (operators/similarity.py ivfpq_topk_batch): "
        "the per-query when-chain becomes a broadcast ADC-table RELATION "
        "(query_id, cell_id, s, code, dist) joined against the probed "
        "cells' codes exploded to (id, s, code); per-(query, id) scores "
        "reassemble by subspace pivot (one F.sum per subspace over "
        "exactly one row, then a left-to-right chain — engine-exact), "
        "ranked per query. ONE job for the whole batch — the production "
        "query path when searches arrive in batches; plan size is "
        "independent of |Q| x K. The oracle replays assignment, residual "
        "encoding, per-query probing and the joined ADC sums in SQL."
    ),
    oracle=f"""
        WITH cents AS (
            SELECT vec_id AS cell_id, embedding AS centroid
            FROM embeddings WHERE vec_id < {_IVFPQ_CELLS}
        ),
        book AS (
            SELECT vec_id AS j, embedding AS cw
            FROM embeddings
            WHERE vec_id >= {_IVFPQ_BOOK_LO} AND vec_id < {_IVFPQ_BOOK_HI}
        ),
        assigned AS (
            SELECT vec_id, embedding, cell_id, centroid FROM (
                SELECT e.vec_id, e.embedding, c.cell_id, c.centroid,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM embeddings e, cents c
            ) WHERE rn = 1
        ),
        sub AS (SELECT unnest(generate_series(0, {_PQ_SUBSPACES - 1})) AS s),
        enc AS (
            SELECT vec_id, cell_id, s, j FROM (
                SELECT a.vec_id, a.cell_id, sub.s, b.j,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.vec_id, sub.s
                           ORDER BY {_pq_resid_dist_sql('a.embedding', 'a.centroid', 'b.cw', 'sub.s')} ASC,
                                    b.j ASC) AS rn
                FROM assigned a CROSS JOIN sub CROSS JOIN book b
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT query_id, q_emb, cell_id, centroid FROM (
                SELECT q.vec_id AS query_id, q.embedding AS q_emb,
                       c.cell_id, c.centroid,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               q.embedding::DOUBLE[], c.centroid::DOUBLE[]) DESC,
                               c.cell_id ASC) AS rn
                FROM embeddings q, cents c
                WHERE q.vec_id < 3
            ) WHERE rn <= {_IVF_NPROBE}
        ),
        qt AS (
            SELECT p.query_id, p.cell_id, sub.s, b.j,
                   {_pq_resid_dist_sql('p.q_emb', 'p.centroid', 'b.cw', 'sub.s')} AS t
            FROM probes p CROSS JOIN sub CROSS JOIN book b
        ),
        joined AS (
            SELECT qt.query_id, enc.vec_id, enc.s, qt.t
            FROM enc JOIN qt
              ON qt.cell_id = enc.cell_id AND qt.s = enc.s AND qt.j = enc.j
            WHERE enc.vec_id <> qt.query_id
        ),
        piv AS (
            SELECT query_id, vec_id,
                   {", ".join(f"MAX(CASE WHEN s={s} THEN t END) AS t{s}" for s in range(_PQ_SUBSPACES))}
            FROM joined GROUP BY query_id, vec_id
        ),
        scored AS (
            SELECT query_id, vec_id,
                   {" + ".join(f"t{s}" for s in range(_PQ_SUBSPACES))} AS approx
            FROM piv
        )
        SELECT query_id, vec_id, ROUND(approx, 6) AS approx_dist,
               CAST(rnk AS INTEGER) AS "rank"
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY approx ASC, vec_id ASC) AS rnk
              FROM scored)
        WHERE rnk <= {_IVF_K}
    """,
)
def embedding_ivfpq_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_batch,
        pq_encode_residual,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < _IVFPQ_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter(
        (F.col("vec_id") >= _IVFPQ_BOOK_LO) & (F.col("vec_id") < _IVFPQ_BOOK_HI)
    ).select(F.col("vec_id").alias("j"), "embedding")
    encoded = pq_encode_residual(
        emb.select("vec_id", "embedding"), cents, book,
        n_subspaces=_PQ_SUBSPACES,
    )
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivfpq_topk_batch(
        encoded, queries, cent_rows, book_rows,
        k=_IVF_K, nprobe=_IVF_NPROBE, n_subspaces=_PQ_SUBSPACES,
    )


_KM_K = 8
_KM_SCALE = 1000000


def _l2_dist_sql(e: str, c: str, dim: int = 64) -> str:
    """Full-dimension squared-L2 between two DuckDB lists as an explicit
    left-associative term chain — the accumulation order pq_encode (and
    therefore kmeans_train's assignment) uses."""
    terms = []
    for i in range(1, dim + 1):
        d = f"({e}[{i}]::DOUBLE - {c}[{i}]::DOUBLE)"
        terms.append(f"{d} * {d}")
    return " + ".join(terms)


@register(
    "kmeans_cells",
    doc=(
        "Fixed-point Lloyd's k-means (operators/similarity.py "
        "kmeans_train): one update round + final assignment, k=8, seeds "
        "= first k vectors. The centroid update quantizes coordinates to "
        "integers and averages with INTEGER sums, so the whole training "
        "trace is exact under any partitioning or engine — this is the "
        "in-engine offline pass that produces the IVF/SemDeDup/PQ "
        "codebooks the other vector queries consume. Per iteration: one "
        "map-only encode pass + one integer-sum shuffle on (cell, dim); "
        "only the k x dim stats ever reach the driver."
    ),
    oracle=f"""
        WITH seeds AS (
            SELECT vec_id AS pos, embedding FROM embeddings WHERE vec_id < {_KM_K}
        ),
        a1 AS (
            SELECT vec_id, embedding, pos FROM (
                SELECT e.vec_id, e.embedding, s.pos,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2_dist_sql('e.embedding', 's.embedding')} ASC,
                                    s.pos ASC) AS rn
                FROM embeddings e CROSS JOIN seeds s
            ) WHERE rn = 1
        ),
        qx AS (
            SELECT pos, i,
                   CAST(ROUND(embedding[i]::DOUBLE * {_KM_SCALE}.0) AS BIGINT) AS qx
            FROM a1, (SELECT unnest(generate_series(1, 64)) AS i) dims
        ),
        upd AS (SELECT pos, i, SUM(qx) AS s, COUNT(*) AS n FROM qx GROUP BY pos, i),
        cent AS (
            SELECT pos, list(s::DOUBLE / ({_KM_SCALE}.0 * n) ORDER BY i) AS cent
            FROM upd GROUP BY pos
        ),
        a2 AS (
            SELECT vec_id, pos FROM (
                SELECT e.vec_id, c.pos,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_l2_dist_sql('e.embedding', 'c.cent')} ASC,
                                    c.pos ASC) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        sizes AS (SELECT pos, COUNT(*) AS n_members FROM a2 GROUP BY pos)
        SELECT a2.vec_id, a2.pos AS cell_id, sizes.n_members
        FROM a2 JOIN sizes USING (pos)
    """,
)
def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import kmeans_train

    emb = read_table(spark, sf_dir, "embeddings")
    _cells, _book, assigned = kmeans_train(emb, k=_KM_K, iters=1, scale=_KM_SCALE)
    sizes = assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_members"))
    return assigned.select("vec_id", "cell_id").join(sizes, "cell_id").select(
        "vec_id", "cell_id", "n_members"
    )


def _semantic_decon_oracle(
    dim: int = 64, n_planes: int = 4, threshold: float = 0.25
) -> str:
    """Exact DuckDB replay of semantic decontamination (same plane-literal
    technique as _near_dup_oracle; the argmax orders by ROUNDED cosine then
    eval id, exactly as the operator does)."""
    from biocache_store_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    bits = "\n            || ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ",".join(repr(v) for v in plane)
        + "]::DOUBLE[]) > 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    return f"""
        WITH b AS (
            SELECT vec_id, label, embedding,
                   {bits} AS bucket
            FROM embeddings
        ),
        ev AS (
            SELECT * FROM (
                SELECT vec_id AS eval_id, embedding, bucket,
                       COUNT(*) OVER (PARTITION BY bucket) AS n
                FROM b WHERE label = 0
            ) WHERE n <= 100000
        ),
        tr AS (SELECT vec_id, embedding, bucket FROM b WHERE label <> 0),
        cand AS (
            -- COALESCE mirrors the operator's null-tolerant sentinel: a
            -- NULL embedding still joins (it buckets to all-'0' on both
            -- engines) and must score -2.0 here too, not NULL
            SELECT t.vec_id, e.eval_id,
                   ROUND(COALESCE(list_cosine_similarity(
                             t.embedding::DOUBLE[], e.embedding::DOUBLE[]),
                         CAST(-2.0 AS DOUBLE)), 4) AS cos_sim
            FROM tr t JOIN ev e ON t.bucket = e.bucket
        ),
        best AS (
            SELECT vec_id, eval_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY cos_sim DESC, eval_id ASC
                   ) AS rn
            FROM cand
        )
        SELECT vec_id, eval_id, cos_sim,
               cos_sim >= CAST({threshold} AS DOUBLE) AS contaminated
        FROM best WHERE rn = 1
    """


@register(
    "semantic_decontamination",
    doc=(
        "Embedding-level benchmark decontamination (operators/similarity.py "
        "semantic_decontamination): the semantic twin of "
        "ngram_decontamination — label-0 vectors stand in as the eval "
        "benchmark, every other vector reports its closest same-LSH-bucket "
        "eval neighbor (rounded-cosine argmax, eval-id tie-break) and is "
        "flagged when cosine >= 0.25 (the synthetic corpus's near-dup bar; "
        "~0.95 on real embeddings). Candidates are bucket-local cross-set "
        "pairs only — never all-pairs, never train x train — with the "
        "eval-side bucket cap bounding per-row fan-out at 100 TB."
    ),
    oracle=_semantic_decon_oracle(),
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biocache_store_spark.operators.similarity import (
        semantic_decontamination as _decon,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return _decon(
        emb.filter(F.col("label") != 0),
        emb.filter(F.col("label") == 0),
        dim=64,
        threshold=0.25,
        n_planes=4,
    )
