"""Approximate nearest-neighbor search over embedding columns.

Brute-force cosine (functions/vectors.py + the embedding_* queries) is the
correctness baseline; this module adds the scale path: random-hyperplane LSH
(sign-of-dot-product bits -> bucket key) so candidate generation touches
only same-bucket vectors instead of the full corpus. Hyperplanes are derived
deterministically from md5 (same philosophy as operators/minhash.py), so
bucketing is reproducible run-to-run.

Shapes:
  * `bucketize`: one pass adding the bucket key (JVM-side F.aggregate dot
    products against broadcast hyperplane literals);
  * `ann_topk`: per-query-vector top-k restricted to matching buckets
    (multi-probe: the query's bucket plus 1-bit-flip neighbors to lift
    recall), re-ranked by exact cosine.

At 100 TB the bucketed table is written partitioned by bucket; a query batch
broadcasts its (few) probe buckets and the scan prunes to those partitions.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.functions.vectors import (
    cosine_similarity_arrow,
    cosine_similarity_arrow_once,
)
from biocache_store_spark.util import arrow_rows_df, local_rows_df

DEFAULT_PLANES = 8


def hyperplanes(dim: int, n_planes: int = DEFAULT_PLANES, seed: str = "ann") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim from md5."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()
            (value,) = struct.unpack(">I", digest[:4])
            row.append(value / 0x7FFFFFFF - 1.0)
        planes.append(row)
    return planes


def _bucket_expr(embedding: Column, planes: list[list[float]]) -> Column:
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    embedding,
                    F.array(*[F.lit(v) for v in plane]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            "1",
        ).otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def bucketize(
    vectors: DataFrame,
    dim: int,
    n_planes: int = DEFAULT_PLANES,
    embedding_col: str = "embedding",
) -> DataFrame:
    return vectors.withColumn(
        "bucket", _bucket_expr(F.col(embedding_col), hyperplanes(dim, n_planes))
    )


def _probe_buckets_expr(bucket: Column, n_planes: int) -> Column:
    """Array of the bucket plus all 1-bit flips (multi-probe LSH) — pure
    string expressions, so no Python UDF (and no worker import dependency)
    is involved."""
    probes = [bucket]
    for i in range(n_planes):
        flipped = F.concat(
            bucket.substr(F.lit(1), F.lit(i)),
            F.when(bucket.substr(i + 1, 1) == "1", "0").otherwise("1"),
            bucket.substr(F.lit(i + 2), F.lit(n_planes - i - 1)),
        )
        probes.append(flipped)
    return F.array(*probes)


def ann_topk(
    vectors: DataFrame,
    query_vectors: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = DEFAULT_PLANES,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k per query vector.

    query_vectors: (query_id, embedding). Returns (query_id, vec_id,
    cos_sim, rank) with rank 1..k by exact cosine within the probed buckets.
    """
    from pyspark.sql.window import Window

    planes = hyperplanes(dim, n_planes)
    bucketed = vectors.withColumn(
        "bucket", _bucket_expr(F.col(embedding_col), planes)
    )
    queries = query_vectors.withColumn(
        "__qbucket", _bucket_expr(F.col(embedding_col), planes)
    ).select(
        F.col("query_id"),
        F.col(embedding_col).alias("__q_emb"),
        F.explode(
            _probe_buckets_expr(F.col("__qbucket"), n_planes)
        ).alias("bucket"),
    )
    sim = cosine_similarity_arrow(F.col(embedding_col), F.col("__q_emb"))
    candidates = (
        bucketed.join(F.broadcast(queries), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos_sim", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def cosine_near_duplicates(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 4,
    max_bucket: int = 100_000,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    The dedup companion to `ann_topk`: same-bucket pairs (id_a < id_b)
    whose exact cosine clears `threshold`. Candidate generation never goes
    all-pairs — only within random-hyperplane buckets — and buckets larger
    than `max_bucket` are dropped entirely (the hot-key guard the rest of
    the dedup family uses: a degenerate embedding cluster would otherwise
    make one bucket quadratic at scale; dropped buckets are the caller's
    signal to re-bucket with more planes).

    Returns (id_a, id_b, cos_sim) with cos_sim rounded to 4dp. The
    md5-seeded planes make the bucketing — and therefore the full result —
    exactly reproducible in SQL.
    """
    planes = hyperplanes(dim, n_planes)
    bucketed = vectors.select(
        F.col(id_col), F.col(embedding_col)
    ).withColumn("bucket", _bucket_expr(F.col(embedding_col), planes))
    sizes = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("__n"))
    # <= 2^n_planes rows: broadcastable at any data scale
    capped = bucketed.join(
        F.broadcast(sizes.filter(F.col("__n") <= max_bucket)), "bucket"
    ).drop("__n")
    a = capped.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(embedding_col).alias("__emb_a"),
    )
    b = capped.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(embedding_col).alias("__emb_b"),
    )
    # _once variant (guide §4.4): the threshold filter consumes the UDF
    # column, which otherwise duplicates ArrowEvalPython — every candidate
    # pair scored once for the filter and survivors again for the output.
    # coalesce keeps the threshold filter null-tolerant so the optimizer
    # never needs to duplicate the (Python-evaluated) cosine into an
    # inferred notnull filter below the join
    sim = cosine_similarity_arrow_once(F.col("__emb_a"), F.col("__emb_b"))
    return (
        a.join(b.hint("shuffle_hash"), ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.coalesce(sim, F.lit(-2.0)))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: argmax-cosine against the broadcast centroid
    table (cell_id, centroid). Centroids are externally supplied — the
    production IVF shape, where they come from an offline training pass —
    so the whole index build is one broadcast join + per-vector argmax
    (map-side, no shuffle of the corpus beyond the argmax partial agg).
    Ties break to the lowest cell_id for determinism."""
    from pyspark.sql.window import Window

    sim = cosine_similarity_arrow(F.col(embedding_col), F.col("__centroid"))
    scored = vectors.join(
        F.broadcast(
            centroids.select(
                F.col("cell_id"), F.col("centroid").alias("__centroid")
            )
        )
    ).withColumn("__cs", sim)
    w = Window.partitionBy(id_col).orderBy(
        F.col("__cs").desc(), F.col("cell_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cs", "__centroid")
    )


def _argmax_cosine_positions(A, matrix):
    """Per-row argmax-cosine cell POSITION for a stacked float64 batch
    `A` (n x d) against the centroid matrix `matrix` (k x d list) — the
    ONE assignment kernel behind ivf_assign_bulk and pq_encode_residual
    (shared so the tie/accumulation semantics can never drift, the
    point-ladder lesson). Dots/norms accumulate dimension-by-dimension
    left-to-right exactly like functions/vectors.py
    `_accumulate_sequential`; the strictly-greater update keeps the
    LOWEST position on ties (the join form's cs DESC, cell_id ASC
    order)."""
    import numpy as np

    M = np.asarray(matrix, dtype=np.float64)  # k x d
    k, d = M.shape
    nb = []
    for j in range(k):
        acc = M[j, 0] * M[j, 0]
        for i in range(1, d):
            acc = acc + M[j, i] * M[j, i]
        nb.append(acc)
    na = A[:, 0] * A[:, 0]
    for i in range(1, d):
        na = na + A[:, i] * A[:, i]
    sqrt_na = np.sqrt(na)
    best_cs = None
    best = np.zeros(len(A), dtype=np.int64)
    for j in range(k):
        dot = A[:, 0] * M[j, 0]
        for i in range(1, d):
            dot = dot + A[:, i] * M[j, i]
        cs = dot / (sqrt_na * np.sqrt(nb[j]))
        if best_cs is None:
            best_cs = cs
        else:
            upd = cs > best_cs  # strict: ties keep lowest cell_id
            best_cs = np.where(upd, cs, best_cs)
            best = np.where(upd, j, best)
    return best


def _arrow_emb_matrix(arr):
    """(validity mask as np bool vector, (n_valid, dim) float64 matrix or
    None) from an Arrow list-of-float column — the mapInArrow input form
    of the functions/vectors.py extraction: the list batch's contiguous
    values buffer reshapes straight into a matrix (no pandas conversion,
    no per-row ndarray boxing, no np.stack), which is the whole point of
    the round-13 mapInPandas→mapInArrow kernel migration."""
    import numpy as np
    import pyarrow as pa

    from biocache_store_spark.functions.vectors import _matrix_f64, _valid_mask

    mask = _valid_mask(arr)
    if not mask.any():
        return mask, None
    if mask.all():
        return mask, _matrix_f64(arr)
    return mask, _matrix_f64(arr.take(pa.array(np.flatnonzero(mask))))


def ivf_assign_bulk(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Matrix-form IVF assignment for the k-grows-with-corpus regime.

    `ivf_assign` scores via a broadcast join, which materializes N x k rows
    through the pandas-UDF cosine before the argmax — fine for a fixed
    small k, but SemDeDup-style clustering grows the cell count with the
    corpus (k ~ N), making that intermediate quadratic (measured: 5x data
    -> 19x wall-clock at 100k vectors x 800 cells). This variant collects
    the centroid table once (it is a dimension by contract — k rows of d
    doubles), ships it into ONE mapInArrow pass, and scores every
    centroid against the whole Arrow batch with numpy — no joined
    intermediate, no shuffle, argmax inside the batch, and the input
    columns pass through as Arrow arrays untouched (the former
    mapInPandas form paid an Arrow→pandas conversion + np.stack boxing
    of every embedding + a full pandas copy of the batch per pass).

    Bit-identical to `ivf_assign`: dots/norms accumulate dimension-by-
    dimension left-to-right exactly like functions/vectors.py
    `_accumulate_sequential`, and the strictly-greater argmax update keeps
    the LOWEST cell_id on ties (the window's cs DESC, cell_id ASC order).
    Null embeddings take the lowest cell_id, matching the join form's
    all-null ordering. Output schema: input columns + cell_id.
    """
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_type

    cent_rows = sorted(
        centroids.select("cell_id", "centroid").collect(),
        key=lambda r: r["cell_id"],
    )
    if not cent_rows:
        raise ValueError("ivf_assign_bulk: empty centroid table")
    cell_ids = [r["cell_id"] for r in cent_rows]
    matrix = [[float(x) for x in r["centroid"]] for r in cent_rows]
    cell_type = centroids.schema["cell_id"].dataType
    out_schema = T.StructType(
        list(vectors.schema.fields) + [T.StructField("cell_id", cell_type)]
    )
    in_cols = list(vectors.columns)
    emb_idx = in_cols.index(embedding_col)
    arrow_cell_type = to_arrow_type(cell_type)

    def run(batches):
        import numpy as np
        import pyarrow as pa

        cid = np.asarray(cell_ids)
        for rb in batches:
            mask, A = _arrow_emb_matrix(rb.column(emb_idx))
            best_idx = np.zeros(rb.num_rows, dtype=np.int64)
            if A is not None:
                best_idx[mask] = _argmax_cosine_positions(A, matrix)
            cells = pa.array(cid[best_idx], type=arrow_cell_type)
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [cells], names=in_cols + ["cell_id"]
            )

    return vectors.mapInArrow(run, out_schema)


def _query_probes(
    query_vectors: "DataFrame",
    centroids: "DataFrame",
    nprobe: int,
    embedding_col: str = "embedding",
) -> "DataFrame":
    """(query_id, __q_emb, cell_id) for each query's `nprobe` nearest
    cells — the probe computation shared by ivf_topk (in-memory corpus)
    and query_ivf_index (persisted index). Centroids broadcast; ties to
    the lowest cell_id."""
    from pyspark.sql.window import Window

    qsim = cosine_similarity_arrow(F.col(embedding_col), F.col("__centroid"))
    qscored = query_vectors.join(
        F.broadcast(
            centroids.select(
                F.col("cell_id"), F.col("centroid").alias("__centroid")
            )
        )
    ).withColumn("__cs", qsim)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__cs").desc(), F.col("cell_id").asc()
    )
    return (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", F.col(embedding_col).alias("__q_emb"), "cell_id")
    )


def ivf_topk(
    vectors: DataFrame,
    query_vectors: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the query's `nprobe` nearest cells,
    exact-cosine re-rank within them.

    The coarse-quantizer companion to the hyperplane `ann_topk`: recall is
    controlled by nprobe instead of bit flips, and at 100 TB the assigned
    table is written partitioned by cell_id so a query batch prunes its
    scan to the probed cells. query_vectors: (query_id, embedding).
    Returns (query_id, vec_id, cos_sim, rank).

    `assigned` (optional) short-circuits the per-call cell assignment
    with a precomputed `vectors + cell_id` relation (ivf_assign /
    ivf_assign_bulk output, bit-identical by contract) — the
    index-built-once-queried-many production shape, and what the nprobe
    recall sweep in tools/bench_ann_recall.py reuses across configs;
    write_ivf_index/query_ivf_index is the persisted, partition-pruned
    form of the same split."""
    from pyspark.sql.window import Window

    if assigned is None:
        assigned = ivf_assign(vectors, centroids, id_col, embedding_col)
    probes = _query_probes(query_vectors, centroids, nprobe, embedding_col)
    sim = cosine_similarity_arrow(F.col(embedding_col), F.col("__q_emb"))
    candidates = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos_sim", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.5,
    max_cell: int = 100_000,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every vector to its nearest-centroid IVF cell, then WITHIN each cell
    prune any vector that has a lower-id cell-mate with cosine >=
    `threshold`. Greedy-by-id is the deterministic stand-in for the
    paper's keep-one-representative rule, and clustering first means the
    pairwise pass is never corpus-quadratic — only cell-quadratic, with
    cell count grown proportionally to corpus size (the paper's k ~ N
    regime). Cells larger than `max_cell` are dropped from pairing
    entirely (same hot-key guard as `cosine_near_duplicates`: a
    degenerate cluster signals re-clustering, not a quadratic join).

    Returns one row per input vector: (id, cell_id, keep) — the pruning
    decision table a curation pipeline joins back against the corpus.
    Scale shape: one broadcast argmax (assignment), one shuffle on
    cell_id for the self-join, one left_anti back on the id. No driver
    collection anywhere.
    """
    # persist: the assignment feeds four plan branches (sizes, both sides
    # of the self-join, the keep-flag join-back) whose projections differ,
    # so without it the numpy scoring pass re-runs per branch — the exact
    # cost the bulk path exists to avoid. Kept as persist() after an r12
    # A/B against a ContextCleaner-managed lazy localCheckpoint: the
    # checkpoint serializes the embedding-carrying rows and measured
    # 1.52 -> 1.94 s at sf0.1, and unlike probe_lsh_index this operator
    # is not on a per-microbatch streaming path (semantic_dedup_stream
    # goes through query_ivf_index), so the CacheManager entry a lazy
    # return cannot unpersist accrues per direct call only.
    assigned = ivf_assign_bulk(
        vectors.select(id_col, embedding_col), centroids, id_col, embedding_col
    ).persist()
    sizes = assigned.groupBy("cell_id").agg(F.count(F.lit(1)).alias("__n"))
    # one row per centroid: broadcastable at any corpus size
    paired = assigned.join(
        F.broadcast(sizes.filter(F.col("__n") <= max_cell)), "cell_id"
    ).drop("__n")
    a = paired.select(
        F.col("cell_id"),
        F.col(id_col).alias("__id_a"),
        F.col(embedding_col).alias("__emb_a"),
    )
    b = paired.select(
        F.col("cell_id"),
        F.col(id_col).alias("__id_b"),
        F.col(embedding_col).alias("__emb_b"),
    )
    # _once variant (guide §4.4): the threshold filter consumes the UDF
    # column — the plain UDF would be duplicated around the pushed filter
    sim = cosine_similarity_arrow_once(F.col("__emb_a"), F.col("__emb_b"))
    pruned = (
        a.join(b.hint("shuffle_hash"), ["cell_id"])
        .filter(F.col("__id_a") < F.col("__id_b"))
        .withColumn("__cs", F.coalesce(sim, F.lit(-2.0)))
        .filter(F.col("__cs") >= threshold)
        .select(F.col("__id_b").alias(id_col))
        .dropDuplicates([id_col])
    )
    return assigned.select(id_col, "cell_id").join(
        pruned.withColumn("__pruned", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cell_id",
        F.coalesce(~F.col("__pruned"), F.lit(True)).alias("keep"),
    )


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: the embedding is split into
    `n_subspaces` contiguous sub-vectors and each sub-vector is replaced
    by the index of its nearest (L2) codeword — the 64-dim float vector
    becomes `n_subspaces` small ints, the ~32x compression that lets a
    100 TB embedding corpus keep its whole index in memory (Jegou et al.,
    "Product Quantization for Nearest Neighbor Search").

    `codebook` is (j, embedding): full-dimension vectors whose per-
    subspace slices form the per-subspace codebooks (the deterministic
    stand-in for the offline per-subspace k-means pass, same convention
    as the IVF centroids). It is a dimension by contract and is collected
    once; encoding is ONE mapInArrow pass (input columns pass through as
    Arrow arrays, embeddings reshape zero-copy — no pandas boxing), no
    join, no shuffle — distances accumulate dimension-by-dimension
    left-to-right (the functions/vectors.py discipline) so codes are
    engine-exact. Ties break to the lowest codeword index. Output:
    input columns + `codes` array<int>.
    """
    from pyspark.sql import types as T

    rows = sorted(codebook.select("j", embedding_col).collect(), key=lambda r: r["j"])
    if not rows:
        raise ValueError("pq_encode: empty codebook")
    book = [[float(x) for x in r[embedding_col]] for r in rows]
    dim = len(book[0])
    if dim % n_subspaces:
        raise ValueError(f"pq_encode: dim {dim} not divisible by {n_subspaces}")
    ds = dim // n_subspaces
    out_schema = T.StructType(
        list(vectors.schema.fields)
        + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )
    in_cols = list(vectors.columns)
    emb_idx = in_cols.index(embedding_col)

    def run(batches):
        import numpy as np
        import pyarrow as pa

        B = np.asarray(book, dtype=np.float64)  # K x dim
        K = B.shape[0]
        for rb in batches:
            mask, A = _arrow_emb_matrix(rb.column(emb_idx))
            codes_col = [None] * rb.num_rows
            if A is not None:
                n = A.shape[0]
                codes = np.zeros((n, n_subspaces), dtype=np.int32)
                for s in range(n_subspaces):
                    lo = s * ds
                    best_d = None
                    best = np.zeros(n, dtype=np.int32)
                    for j in range(K):
                        d0 = A[:, lo] - B[j, lo]
                        acc = d0 * d0
                        for i in range(1, ds):
                            di = A[:, lo + i] - B[j, lo + i]
                            acc = acc + di * di
                        if best_d is None:
                            best_d = acc
                        else:
                            upd = acc < best_d  # strict: ties keep lowest j
                            best_d = np.where(upd, acc, best_d)
                            best = np.where(upd, j, best)
                    codes[:, s] = best
                it = iter(codes.tolist())
                codes_col = [next(it) if m else None for m in mask]
            codes_arr = pa.array(codes_col, type=pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [codes_arr], names=in_cols + ["codes"]
            )

    return vectors.mapInArrow(run, out_schema)


def pq_topk(
    encoded: DataFrame,
    query_vec: list[float],
    codebook_rows: list[list[float]],
    k: int = 10,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): the query stays exact; each
    encoded vector's approximate squared-L2 distance is the sum of
    per-subspace table lookups dist(q_s, codeword). The table (8 x K
    doubles) is a literal nested array in the plan, so scoring is pure
    JVM expression work over the int codes — whole-stage codegen, no
    Python, no join — and the top-k is TakeOrderedAndProject, never a
    full sort. Per-subspace entries add left-to-right, keeping the score
    engine-exact. Returns (id, approx_dist rounded 6dp, rank)."""
    q = [float(x) for x in query_vec]
    book = [[float(x) for x in row] for row in codebook_rows]
    dim = len(q)
    if dim % n_subspaces:
        raise ValueError(
            f"pq_topk: query dim {dim} not divisible by {n_subspaces}"
        )
    if any(len(cw) != dim for cw in book):
        raise ValueError("pq_topk: codebook dim differs from query dim")
    ds = dim // n_subspaces
    table = []
    for s in range(n_subspaces):
        lo = s * ds
        row = []
        for cw in book:
            d = (q[lo] - cw[lo]) * (q[lo] - cw[lo])
            for i in range(1, ds):
                di = q[lo + i] - cw[lo + i]
                d = d + di * di
            row.append(d)
        table.append(row)
    t_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in table])
    approx = None
    for s in range(n_subspaces):
        term = F.element_at(
            F.element_at(t_lit, s + 1), F.col("codes")[s] + F.lit(1)
        )
        approx = term if approx is None else (approx + term)
    from pyspark.sql.window import Window

    # null codes (pq_encode's null-embedding convention) are unscoreable,
    # and a code array whose length differs from n_subspaces (a store
    # written under different dims) would make codes[s] — and therefore
    # the whole score — NULL; both are filtered out, and the ordering is
    # additionally NULLS LAST so a malformed row can never displace a
    # real neighbor under ASC NULLS FIRST
    scored = encoded.filter(
        F.col("codes").isNotNull() & (F.size("codes") == n_subspaces)
    ).select(F.col(id_col), approx.alias("__approx"))
    # rank over the UNROUNDED score (rounding could merge distinct values
    # and reorder ties); the single-partition window runs over k rows only
    w = Window.orderBy(F.col("__approx").asc_nulls_last(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("__approx").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, F.round("__approx", 6).alias("approx_dist"), "rank")
    )


def kmeans_train(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 1,
    scale: int = 10**6,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
):
    """Fixed-point Lloyd's k-means — the offline training pass the IVF /
    SemDeDup / PQ codebooks come from, runnable in-engine with EXACT
    determinism. Two standard k-means obstacles to reproducibility are
    removed by construction:

      * init is the first `k` vectors by id (no RNG);
      * the centroid update quantizes coordinates to integers
        (round(x * scale)) and averages with INTEGER sums — addition is
        commutative in Z, so the update is identical under any
        partitioning, engine, or reduce order; the only floating-point
        op is one exact division per dimension.

    Assignment is argmin-L2 via the matrix-form encoder
    (`pq_encode(n_subspaces=1)`), accumulating left-to-right — also
    engine-exact. Cells that lose every member are DROPPED for the next
    round (production systems reseed; dropping keeps the trace
    deterministic). `iters` update rounds run, then one final
    assignment.

    Returns (cell_ids, centroids, assigned): seed ids per surviving
    cell, their trained centroid lists, and the final assignment
    DataFrame (input columns + cell_id). Per iteration: one map-only
    encode pass + one integer-sum shuffle on (cell, dim); the k x dim
    stats are the only driver materialization.
    """
    seed_rows = sorted(
        vectors.select(id_col, embedding_col).orderBy(id_col).limit(k).collect(),
        key=lambda r: r[id_col],
    )
    if not seed_rows:
        raise ValueError("kmeans_train: empty input")
    cells = [r[id_col] for r in seed_rows]
    book = [[float(x) for x in r[embedding_col]] for r in seed_rows]
    dim = len(book[0])
    spark = vectors.sparkSession

    def encode(current_book):
        book_df = arrow_rows_df(
            spark,
            f"j long, {embedding_col} array<double>",
            [(j, current_book[j]) for j in range(len(current_book))],
        )
        return pq_encode(
            vectors.select(id_col, embedding_col), book_df, n_subspaces=1,
            id_col=id_col, embedding_col=embedding_col,
        ).select(id_col, embedding_col, F.col("codes")[0].alias("__pos"))

    for _ in range(iters):
        assigned = encode(book)
        ex = assigned.select(
            "__pos", F.posexplode(embedding_col).alias("i", "x")
        )
        q = ex.select(
            "__pos",
            "i",
            F.round(F.col("x").cast("double") * scale, 0)
            .cast("long")
            .alias("qx"),
        )
        stats = (
            q.groupBy("__pos", "i")
            .agg(F.sum("qx").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_pos: dict = {}
        for r in stats:
            by_pos.setdefault(r["__pos"], {})[r["i"]] = (r["s"], r["n"])
        new_cells, new_book = [], []
        for pos in sorted(by_pos):
            dims = by_pos[pos]
            new_cells.append(cells[pos])
            new_book.append(
                [dims[i][0] / (scale * dims[i][1]) for i in range(dim)]
            )
        cells, book = new_cells, new_book

    pos_to_cell = F.array(*[F.lit(c) for c in cells])
    assigned = encode(book).select(
        id_col,
        embedding_col,
        F.element_at(pos_to_cell, F.col("__pos") + 1).alias("cell_id"),
    )
    return cells, book, assigned


def pq_encode_residual(
    vectors: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """IVFADC encoding (Jegou et al., "Product Quantization for Nearest
    Neighbor Search", §IV-A): assign each vector to its IVF cell (argmax
    cosine against `centroids` (cell_id, centroid) — the same strict-
    greater / lowest-cell-on-ties / left-to-right-accumulation math as
    ivf_assign_bulk) and product-quantize the RESIDUAL v − centroid[cell]
    against `codebook` (j, embedding).

    Standalone PQ collapses as within-cell density grows: every member
    of a tight cell shares all codes, so ADC distances tie (measured
    recall@10 0.105 at 1M vectors — SCALE.md 'ANN recall'). Residuals
    spread each cell across the whole codebook and break the degeneracy.
    ONE mapInArrow pass (zero-copy embedding reshape + Arrow passthrough
    of the input columns, no pandas boxing); both tables are collected
    once (dims by contract); every distance accumulates
    dimension-by-dimension left-to-right, so codes are engine-exact.
    Null embeddings take the lowest cell_id and null codes (the
    ivf_assign_bulk / pq_encode conventions). Output: input columns +
    cell_id + codes — write it partitioned by cell_id for the
    probe-pruned 100 TB layout."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_type

    cent_rows = sorted(
        centroids.select("cell_id", "centroid").collect(),
        key=lambda r: r["cell_id"],
    )
    if not cent_rows:
        raise ValueError("pq_encode_residual: empty centroid table")
    cell_ids = [r["cell_id"] for r in cent_rows]
    cmat = [[float(x) for x in r["centroid"]] for r in cent_rows]
    book_rows = sorted(
        codebook.select("j", embedding_col).collect(), key=lambda r: r["j"]
    )
    if not book_rows:
        raise ValueError("pq_encode_residual: empty codebook")
    book = [[float(x) for x in r[embedding_col]] for r in book_rows]
    dim = len(book[0])
    if dim % n_subspaces:
        raise ValueError(
            f"pq_encode_residual: dim {dim} not divisible by {n_subspaces}"
        )
    if any(len(c) != dim for c in cmat):
        raise ValueError("pq_encode_residual: centroid dim differs from codebook")
    ds = dim // n_subspaces
    cell_type = centroids.schema["cell_id"].dataType
    out_schema = T.StructType(
        list(vectors.schema.fields)
        + [
            T.StructField("cell_id", cell_type),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )
    in_cols = list(vectors.columns)
    emb_idx = in_cols.index(embedding_col)
    arrow_cell_type = to_arrow_type(cell_type)

    def run(batches):
        import numpy as np
        import pyarrow as pa

        M = np.asarray(cmat, dtype=np.float64)  # ncell x dim
        B = np.asarray(book, dtype=np.float64)  # K x dim
        K = B.shape[0]
        cid = np.asarray(cell_ids)
        for rb in batches:
            mask, A = _arrow_emb_matrix(rb.column(emb_idx))
            best_idx = np.zeros(rb.num_rows, dtype=np.int64)
            codes_col = [None] * rb.num_rows
            if A is not None:
                n = len(A)
                best = _argmax_cosine_positions(A, cmat)
                best_idx[mask] = best
                R = A - M[best]  # the residuals PQ actually encodes
                codes = np.zeros((n, n_subspaces), dtype=np.int32)
                for s in range(n_subspaces):
                    lo = s * ds
                    best_d = None
                    bj = np.zeros(n, dtype=np.int32)
                    for j in range(K):
                        d0 = R[:, lo] - B[j, lo]
                        acc = d0 * d0
                        for i in range(1, ds):
                            di = R[:, lo + i] - B[j, lo + i]
                            acc = acc + di * di
                        if best_d is None:
                            best_d = acc
                        else:
                            upd = acc < best_d  # strict: ties keep lowest j
                            best_d = np.where(upd, acc, best_d)
                            bj = np.where(upd, j, bj)
                    codes[:, s] = bj
                it = iter(codes.tolist())
                codes_col = [next(it) if m else None for m in mask]
            cells = pa.array(cid[best_idx], type=arrow_cell_type)
            codes_arr = pa.array(codes_col, type=pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [cells, codes_arr],
                names=in_cols + ["cell_id", "codes"],
            )

    return vectors.mapInArrow(run, out_schema)


def _ivfpq_probe_cells(q, centroid_rows, nprobe):
    """The query's nprobe nearest cells by exact cosine — driver-side
    (the centroid table is a dimension), left-to-right accumulation,
    ties to the lowest cell_id. Shared by ivfpq_topk and
    query_ivfpq_index so the persisted path can pre-filter the codes
    SCAN with the probed set (partition pruning) before any
    shuffle-bearing operator. Returns [(cos, cell_id, centroid)]."""
    import math

    if nprobe < 1:
        raise ValueError("ivfpq probe: nprobe must be >= 1")
    if not centroid_rows:
        raise ValueError("ivfpq probe: empty centroid table")
    dim = len(q)

    def dot_l2r(a, b):
        acc = a[0] * b[0]
        for i in range(1, len(a)):
            acc = acc + a[i] * b[i]
        return acc

    nq = math.sqrt(dot_l2r(q, q))
    scored_cells = []
    for cell_id, cent in centroid_rows:
        c = [float(x) for x in cent]
        if len(c) != dim:
            raise ValueError("ivfpq probe: centroid dim differs from query dim")
        cs = dot_l2r(q, c) / (nq * math.sqrt(dot_l2r(c, c)))
        scored_cells.append((cs, cell_id, c))
    return sorted(scored_cells, key=lambda t: (-t[0], t[1]))[:nprobe]


def ivfpq_topk(
    encoded: DataFrame,
    query_vec: list[float],
    centroid_rows: list[tuple],
    codebook_rows: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC query (Jegou et al. §IV-B): pick the query's `nprobe`
    nearest cells by exact cosine (driver-side — the centroid table is a
    dimension), build ONE ADC table per probed cell from the query's
    PER-CELL residual q − centroid[cell], and score that cell's
    candidates by summing the table lookups — a when-chain dispatching
    on cell_id, each branch the pq_topk expression with its own table
    literal, all inside whole-stage codegen (no Python, no join). Top-k
    is TakeOrderedAndProject over the probed cells only; with `encoded`
    written partitioned by cell_id the isin(cells) filter prunes the
    scan to nprobe partitions at 100 TB.

    `centroid_rows`: [(cell_id, centroid)] — every trained cell.
    `codebook_rows`: codeword vectors in the SAME sorted-by-j order
    pq_encode_residual collected (codes are positions in that order).
    All per-subspace sums accumulate left-to-right (engine-exact).
    Returns (id, approx_dist rounded 6dp, rank).

    Plan-size bound: the when-chain embeds nprobe x n_subspaces x K
    double literals (nprobe=16, K=256, m=8 -> ~32k — fine; Janino
    method limits start to bite around ~64 KiB of generated code per
    expression). For nprobe x K far beyond that, probe in batches of
    cells and union the per-batch top-k, or store the tables as a
    broadcast (cell, s, code) -> dist relation and join."""
    from pyspark.sql.window import Window

    q = [float(x) for x in query_vec]
    book = [[float(x) for x in row] for row in codebook_rows]
    dim = len(q)
    if dim % n_subspaces:
        raise ValueError(f"ivfpq_topk: query dim {dim} not divisible by {n_subspaces}")
    if any(len(cw) != dim for cw in book):
        raise ValueError("ivfpq_topk: codebook dim differs from query dim")
    ds = dim // n_subspaces
    probed = _ivfpq_probe_cells(q, centroid_rows, nprobe)

    approx = None
    for _cs, cell_id, cent in probed:
        rq = [q[i] - cent[i] for i in range(dim)]  # per-cell residual
        table = []
        for s in range(n_subspaces):
            lo = s * ds
            row = []
            for cw in book:
                d0 = rq[lo] - cw[lo]
                d = d0 * d0
                for i in range(1, ds):
                    di = rq[lo + i] - cw[lo + i]
                    d = d + di * di
                row.append(d)
            table.append(row)
        t_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in table])
        cell_sum = None
        for s in range(n_subspaces):
            term = F.element_at(
                F.element_at(t_lit, s + 1), F.col("codes")[s] + F.lit(1)
            )
            cell_sum = term if cell_sum is None else (cell_sum + term)
        branch = (F.col("cell_id") == F.lit(cell_id), cell_sum)
        approx = (
            F.when(*branch) if approx is None else approx.when(*branch)
        )

    scored = (
        encoded.filter(
            F.col("cell_id").isin([c for _s, c, _v in probed])
            & F.col("codes").isNotNull()
            # wrong-length codes (a store written under different dims)
            # would make codes[s] NULL and the whole score NULL; filter
            # them and keep NULLS LAST so they can never rank as top-k
            & (F.size("codes") == n_subspaces)
        )
        .select(F.col(id_col), approx.alias("__approx"))
    )
    w = Window.orderBy(F.col("__approx").asc_nulls_last(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col("__approx").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, F.round("__approx", 6).alias("approx_dist"), "rank")
    )


def write_ivf_index(
    vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist the IVF index: vectors assigned to cells (matrix-form,
    one map pass) written PARTITIONED BY cell_id under `cells/`, plus the
    centroid dimension under `centroids/`. The vector twin of
    write_lsh_index: build once, probe arriving query batches against the
    store instead of rescanning the corpus — and because the store is
    cell-partitioned, a probe reads ONLY its probed cells' files
    (directory-level pruning, test-asserted). mode='append' adds a new
    split's vectors (assign with the SAME centroid store)."""
    assigned = ivf_assign_bulk(vectors, centroids, id_col, embedding_col)
    assigned.write.mode(mode).partitionBy("cell_id").parquet(path + "/cells")
    if mode == "overwrite":
        centroids.write.mode(mode).parquet(path + "/centroids")
        # a full rebuild starts with a clean slate: tombstones refer to
        # the PREVIOUS corpus and would silently hide rebuilt rows
        from biocache_store_spark.util import hadoop_delete

        hadoop_delete(vectors.sparkSession, path + "/deleted")


def query_ivf_index(
    spark,
    path: str,
    query_vectors: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """Top-k against the persisted IVF index. The query batch's probe
    cells are computed against the (small, collected) centroid store and
    pushed into the scan as a cell_id IN (...) filter, so only the probed
    cells' partition directories are read — per-query-batch cost is
    proportional to the probed cells, never the corpus. Returns
    (query_id, id, cos_sim, rank), identical to `ivf_topk` on the same
    data (equivalence-tested)."""
    from pyspark.sql.window import Window

    centroids = spark.read.parquet(path + "/centroids")
    probes = _query_probes(query_vectors, centroids, nprobe, embedding_col)
    # the probed-cell set is tiny (|queries| x nprobe); collecting it
    # turns the index read into a partition-pruned scan
    probe_cells = sorted(
        {r["cell_id"] for r in probes.select("cell_id").distinct().collect()}
    )
    # dropDuplicates on read absorbs a crash-replayed append (the same
    # defensive dedup probe_lsh_index applies): without it a doubled
    # vector consumes two top-k slots forever
    cells = (
        spark.read.parquet(path + "/cells")
        .filter(F.col("cell_id").isin(probe_cells))
        .dropDuplicates([id_col])
    )
    if exclude_ids is not None:
        # `exclude_ids` (one id column) removes candidates a caller must
        # never match — e.g. a streaming batch excluding ITSELF so a
        # replay after its own append yields identical decisions
        cells = cells.join(
            exclude_ids.select(F.col(exclude_ids.columns[0]).alias(id_col)),
            id_col,
            "left_anti",
        )
    tomb = _ivfpq_tombstones(spark, path, id_col)
    if tomb is not None:
        # delete_from_ivf_index tombstones: deleted vectors stop
        # matching (and stop pruning semantic_dedup_stream arrivals)
        # immediately; vacuum_ivf_index reclaims the rows
        cells = cells.join(F.broadcast(tomb), id_col, "left_anti")
    sim = cosine_similarity_arrow(F.col(embedding_col), F.col("__q_emb"))
    candidates = (
        cells.join(F.broadcast(probes), "cell_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos_sim", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cos_sim", 4).alias("cos_sim"), "rank")
    )


def ivfpq_topk_batch(
    encoded: DataFrame,
    query_vectors: DataFrame,
    centroid_rows: list[tuple],
    codebook_rows: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
    qrows: list | None = None,
) -> DataFrame:
    """Batch IVFADC: one job for a whole query batch. ivfpq_topk's
    when-chain embeds nprobe x m x K double literals PER QUERY — right
    for a single search, plan-explosive for a batch. Here the ADC
    tables become a broadcast RELATION (query_id, cell_id, s, code,
    dist): |Q| x nprobe x m x K rows (50 queries x 4 x 8 x 256 = 409k
    doubles — trivially broadcastable), joined against the probed
    cells' codes exploded to (id, cell_id, s, code). Per-(query, id)
    scores are reassembled by subspace PIVOT — one F.sum per subspace
    over exactly ONE matching row, then a left-to-right t0+..+t(m-1)
    chain — so the ADC sum stays engine-exact, bit-identical per query
    to ivfpq_topk (equivalence-tested). Probe selection runs
    driver-side per collected query through the same _ivfpq_probe_cells
    (query batches are dimension-sized by contract, like every ann_*
    broadcast). Self-matches are excluded (ivf_topk's convention).

    query_vectors: (query_id, embedding). Returns
    (query_id, id, approx_dist rounded 6dp, rank 1..k per query).

    `qrows` (optional) supplies the query batch as already-collected Rows
    so a caller that needed them earlier (query_ivfpq_index_batch probes
    the cell set before building the pruned scan) hands the SAME snapshot
    down instead of collecting a possibly non-deterministic relation
    twice — a second collect could probe cells absent from the scan
    filter and silently truncate results."""
    from pyspark.sql.window import Window

    book = [[float(x) for x in row] for row in codebook_rows]
    if not book:
        raise ValueError("ivfpq_topk_batch: empty codebook")
    dim = len(book[0])
    if dim % n_subspaces:
        raise ValueError(
            f"ivfpq_topk_batch: dim {dim} not divisible by {n_subspaces}"
        )
    if any(len(cw) != dim for cw in book):
        raise ValueError("ivfpq_topk_batch: ragged codebook rows")
    ds = dim // n_subspaces
    if qrows is None:
        qrows = query_vectors.select("query_id", "embedding").collect()
    if not qrows:
        raise ValueError("ivfpq_topk_batch: empty query batch")
    qids = [r["query_id"] for r in qrows]
    if len(set(qids)) != len(qids):
        # a duplicated query_id would emit its ADC-table rows twice, the
        # join would match both, and the per-subspace F.sum would DOUBLE
        # every approx_dist for that query (ranking survives, reported
        # distances don't) — refuse rather than silently mis-report
        dupes = sorted({q for q in qids if qids.count(q) > 1})
        raise ValueError(f"ivfpq_topk_batch: duplicate query_id rows {dupes}")
    spark = encoded.sparkSession
    tbl_rows = []
    for qr in qrows:
        qid = qr["query_id"]
        q = [float(x) for x in qr["embedding"]]
        if len(q) != dim:
            raise ValueError(
                f"ivfpq_topk_batch: query {qid!r} dim {len(q)} differs "
                f"from codebook dim {dim}"
            )
        for _cs, cell_id, cent in _ivfpq_probe_cells(q, centroid_rows, nprobe):
            rq = [q[i] - cent[i] for i in range(dim)]
            for s in range(n_subspaces):
                lo = s * ds
                for j, cw in enumerate(book):
                    d0 = rq[lo] - cw[lo]
                    d = d0 * d0
                    for i in range(1, ds):
                        di = rq[lo + i] - cw[lo + i]
                        d = d + di * di
                    tbl_rows.append((qid, cell_id, s, j, d))
    cell_sql = encoded.schema["cell_id"].dataType.simpleString()
    qid_sql = query_vectors.schema["query_id"].dataType.simpleString()
    tbl = arrow_rows_df(
        spark,
        f"query_id {qid_sql}, cell_id {cell_sql}, s int, code int, "
        "dist double",
        tbl_rows,
    )
    probed_cells = sorted({r[1] for r in tbl_rows})
    exploded = (
        encoded.filter(
            F.col("cell_id").isin(probed_cells)
            & F.col("codes").isNotNull()
            # wrong-length codes (dims mismatch) must not reach the pivot:
            # a missing subspace would leave t{s} NULL and a NULL approx
            & (F.size("codes") == n_subspaces)
        )
        .select(id_col, "cell_id", F.posexplode("codes").alias("s", "code"))
    )
    cand = exploded.join(F.broadcast(tbl), ["cell_id", "s", "code"]).filter(
        F.col(id_col).cast("string") != F.col("query_id").cast("string")
    )
    piv = cand.groupBy("query_id", id_col).agg(
        *[
            F.sum(F.when(F.col("s") == s, F.col("dist"))).alias(f"t{s}")
            for s in range(n_subspaces)
        ]
    )
    approx = F.col("t0")
    for s in range(1, n_subspaces):
        approx = approx + F.col(f"t{s}")
    scored = piv.select("query_id", id_col, approx.alias("__approx"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__approx").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col,
            F.round("__approx", 6).alias("approx_dist"), "rank",
        )
    )


def ivfpq_topk_rerank(
    encoded: DataFrame,
    vectors: DataFrame,
    query_vec: list[float],
    centroid_rows: list[tuple],
    codebook_rows: list[list[float]],
    k: int = 10,
    shortlist: int = 100,
    nprobe: int = 2,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """IVFADC with exact re-rank — the production recipe (Jegou et al.
    §V-A "IVFADC + R"): the ADC scan prunes the corpus to a `shortlist`
    of candidates (coarse, from the int8 codes only), then the shortlist
    joins back to the RAW vectors and the final top-k ranks by exact
    cosine. The shortlist is what buys the recall: at 1M clustered
    vectors, ADC-only recall@10 is 0.28 while re-ranking the ADC top-100
    reaches 0.735 with per-subspace codebooks (SCALE.md 'ANN recall') —
    this operator makes that measured quality reachable through the
    engine surface instead of only via tools/bench_ann_recall.py.

    Scale shape: the ADC stage reads ONLY codes (probed cells, see
    ivfpq_topk); the shortlist is <= `shortlist` rows and is BROADCAST
    into the raw-vector join, so the exact-cosine stage touches one scan
    of `vectors` with no shuffle (and when `vectors` is the index's
    cell-partitioned raw store, query_ivfpq_index prunes that scan to
    the probed cells first). Re-rank order: cosine DESC, id ASC — the
    exact tie-break the LSH/IVF in-plan re-ranks use.

    Returns (id, cos_sim rounded 4dp, rank 1..k)."""
    from pyspark.sql.window import Window

    if shortlist < k:
        raise ValueError(
            f"ivfpq_topk_rerank: shortlist {shortlist} smaller than k {k}"
        )
    short = ivfpq_topk(
        encoded, query_vec, centroid_rows, codebook_rows,
        k=shortlist, nprobe=nprobe, n_subspaces=n_subspaces, id_col=id_col,
    )
    q_lit = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity_arrow(F.col(embedding_col), F.col("__q_emb"))
    cand = (
        vectors.select(id_col, embedding_col)
        .join(F.broadcast(short.select(id_col)), id_col)
        .withColumn("__q_emb", q_lit)
        .withColumn("__cs", sim)
    )
    w = Window.orderBy(F.col("__cs").desc_nulls_last(), F.col(id_col).asc())
    return (
        cand.orderBy(F.col("__cs").desc_nulls_last(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, F.round("__cs", 4).alias("cos_sim"), "rank")
    )


def ivfpq_topk_batch_rerank(
    encoded: DataFrame,
    vectors: DataFrame,
    query_vectors: DataFrame,
    centroid_rows: list[tuple],
    codebook_rows: list[list[float]],
    k: int = 10,
    shortlist: int = 100,
    nprobe: int = 2,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    qrows: list | None = None,
) -> DataFrame:
    """Batch IVFADC + exact re-rank: ivfpq_topk_batch's one-job ADC
    shortlist (|Q| x shortlist rows — 50 x 400 = 20k, trivially
    broadcastable) joined back to the raw vectors, each query's
    candidates re-scored by exact cosine against its own embedding
    (a second |Q|-row broadcast), ranked per query. Still ONE job for
    the whole batch; the exact stage adds one raw-vector scan and no
    shuffle. Per query, bit-identical to ivfpq_topk_rerank
    (equivalence-tested). Returns (query_id, id, cos_sim, rank)."""
    from pyspark.sql.window import Window

    if shortlist < k:
        raise ValueError(
            f"ivfpq_topk_batch_rerank: shortlist {shortlist} smaller than k {k}"
        )
    # collect the query batch ONCE here: the ADC shortlist and the
    # exact-cosine stage must score the SAME embeddings — re-evaluating
    # a non-deterministic query relation for qemb would exact-score
    # candidates shortlisted under different vectors (the double-eval
    # class ADVICE r11 #2 closed on the probe/scan split)
    if qrows is None:
        qrows = query_vectors.select("query_id", "embedding").collect()
    short = ivfpq_topk_batch(
        encoded, query_vectors, centroid_rows, codebook_rows,
        k=shortlist, nprobe=nprobe, n_subspaces=n_subspaces, id_col=id_col,
        qrows=qrows,
    )
    qemb = arrow_rows_df(
        encoded.sparkSession,
        query_vectors.select("query_id", "embedding").schema,
        qrows,
    ).select("query_id", F.col("embedding").alias("__q_emb"))
    sim = cosine_similarity_arrow(F.col(embedding_col), F.col("__q_emb"))
    cand = (
        vectors.select(id_col, embedding_col)
        .join(F.broadcast(short.select("query_id", id_col)), id_col)
        .join(F.broadcast(qemb), "query_id")
        .withColumn("__cs", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cs").desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, F.round("__cs", 4).alias("cos_sim"), "rank"
        )
    )


def _pq_reseed_pool(
    vectors: DataFrame, k: int, id_col: str, embedding_col: str
) -> list[list[float]]:
    """Deterministic reseed pool for subspaces whose k-means dropped
    cells: up to `k` member vectors in HASH order (xxhash64 of the id,
    ties to the id) — a pseudo-random but run-stable sample spread
    across the corpus, fetched with one TakeOrdered pass (never a full
    sort). Collected once and sliced per subspace, so the sequential and
    single-pass trainers reseed identically by construction."""
    rows = (
        vectors.select(id_col, embedding_col)
        .filter(F.col(embedding_col).isNotNull())
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r[embedding_col]] for r in rows]


def _reseed_sub_books(
    sub_books: list[list[list[float]]],
    pool: list[list[float]],
    k: int,
    ds: int,
) -> None:
    """Top every subspace codebook up to exactly `k` codewords (in
    place) with slices of the hash-ordered reseed pool, cycling the pool
    if the corpus is smaller than the deficit. Keeping K uniform across
    subspaces preserves the full K^m product code space — the k_min
    truncation this replaces let the WORST subspace shrink every other
    one (VERDICT r11 #4). A reseeded codeword that duplicates a trained
    one is harmless: argmin ties keep the lowest j, so duplicates are
    simply never assigned."""
    for s, book in enumerate(sub_books):
        if len(book) >= k or not pool:
            continue
        need = k - len(book)
        for t in range(need):
            v = pool[t % len(pool)]
            book.append([float(x) for x in v[s * ds:(s + 1) * ds]])


def _train_pq_codebook_single_pass(
    vectors: DataFrame,
    n_subspaces: int,
    k: int,
    iters: int,
    dim: int,
    ds: int,
    id_col: str,
    embedding_col: str,
    scale: int = 10**6,
) -> list[list[list[float]]]:
    """All m subspace k-means trained in ONE pass per iteration: a
    single mapInArrow assignment computes every subspace's argmin
    position per row (the pq_encode kernel over slices of the same
    float64 batch — identical per-dimension left-to-right accumulation,
    so positions are bit-identical to m separate kmeans_train calls),
    then ONE grouped integer-sum aggregation keyed by (subspace, cell,
    dim) replaces m separate stats shuffles. Cuts vector-relation scans
    from m x (iters + 1) (each kmeans_train: iters stats passes + a
    final assignment the codebook path never used) to iters, with the
    same total aggregated volume (N x dim exploded rows per pass,
    partial-agg'd map-side to <= m*k*ds groups). Returns the per-subspace
    books (possibly < k entries where cells dropped empty — the caller
    reseeds)."""
    from pyspark.sql import types as T

    seed_rows = sorted(
        vectors.select(id_col, embedding_col).orderBy(id_col).limit(k).collect(),
        key=lambda r: r[id_col],
    )
    if not seed_rows:
        raise ValueError("train_pq_codebook: empty input")
    full = [[float(x) for x in r[embedding_col]] for r in seed_rows]
    books = [
        [v[s * ds:(s + 1) * ds] for v in full] for s in range(n_subspaces)
    ]

    emb_type = vectors.schema[embedding_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(embedding_col, emb_type),
            T.StructField("poss", T.ArrayType(T.IntegerType())),
        ]
    )

    def make_assign(current_books):
        def run(batches):
            import numpy as np
            import pyarrow as pa

            Bs = [np.asarray(b, dtype=np.float64) for b in current_books]
            for rb in batches:
                mask, A = _arrow_emb_matrix(rb.column(0))
                poss_col = [None] * rb.num_rows
                if A is not None:
                    n = A.shape[0]
                    poss = np.zeros((n, n_subspaces), dtype=np.int32)
                    for s in range(n_subspaces):
                        lo = s * ds
                        B = Bs[s]
                        best_d = None
                        best = np.zeros(n, dtype=np.int32)
                        for j in range(B.shape[0]):
                            d0 = A[:, lo] - B[j, 0]
                            acc = d0 * d0
                            for i in range(1, ds):
                                di = A[:, lo + i] - B[j, i]
                                acc = acc + di * di
                            if best_d is None:
                                best_d = acc
                            else:
                                upd = acc < best_d  # ties keep lowest j
                                best_d = np.where(upd, acc, best_d)
                                best = np.where(upd, j, best)
                        poss[:, s] = best
                    it = iter(poss.tolist())
                    poss_col = [next(it) if m else None for m in mask]
                poss_arr = pa.array(poss_col, type=pa.list_(pa.int32()))
                yield pa.RecordBatch.from_arrays(
                    [rb.column(0), poss_arr], names=[embedding_col, "poss"]
                )

        return run

    for _ in range(iters):
        enc = vectors.select(embedding_col).mapInArrow(
            make_assign(books), out_schema
        )
        ex = (
            enc.select("poss", F.posexplode(embedding_col).alias("ig", "x"))
            .withColumn("s", F.floor(F.col("ig") / ds).cast("int"))
            .withColumn("i", (F.col("ig") % ds).cast("int"))
            .withColumn("pos", F.element_at(F.col("poss"), F.col("s") + 1))
            # the EXACT fixed-point quantization kmeans_train uses, so the
            # integer sums — and therefore the centroids — are bit-equal
            .withColumn(
                "qx",
                F.round(F.col("x").cast("double") * scale, 0).cast("long"),
            )
        )
        stats = (
            ex.groupBy("s", "pos", "i")
            .agg(F.sum("qx").alias("sm"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_s: dict = {}
        for r in stats:
            by_s.setdefault(r["s"], {}).setdefault(r["pos"], {})[r["i"]] = (
                r["sm"],
                r["n"],
            )
        new_books = []
        for s in range(n_subspaces):
            by_pos = by_s.get(s, {})
            nb = []
            for pos in sorted(by_pos):  # empty cells drop, like kmeans_train
                dims = by_pos[pos]
                nb.append(
                    [dims[i][0] / (scale * dims[i][1]) for i in range(ds)]
                )
            new_books.append(nb)
        books = new_books
    return books


def train_pq_codebook(
    vectors: DataFrame,
    n_subspaces: int = 8,
    k: int = 256,
    iters: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    single_pass: bool = True,
) -> list[list[float]]:
    """The REAL product quantizer's training pass (Jegou et al. §II):
    one independent k-means per subspace SLICE, stitched back into
    full-dimension codebook rows (codeword j's subspace-s slice =
    subspace-s centroid j — exactly the row shape pq_encode /
    pq_encode_residual consume). A single full-dimension k-means
    correlates the slices and wastes most of the k^m product space:
    measured at 1M residual vectors, per-subspace training lifted
    IVFADC re-rank recall@10 from 0.57 to 0.735 at identical
    compression (SCALE.md 'ANN recall').

    Train it on RESIDUALS (v − centroid[cell]) for IVFADC, on raw
    vectors for plain PQ. Training is the engine's deterministic
    fixed-point k-means (integer-sum updates, no RNG), so the codebook
    is reproducible under any partitioning. `single_pass=True` (the
    default, VERDICT r11 #5) trains all m subspaces together — ONE
    assignment-plus-stats pass per iteration instead of m scans per
    iteration plus m discarded final assignments, bit-identical output
    (parity-tested) — so at 100 TB the vector relation is read `iters`
    times total. `single_pass=False` keeps the m-sequential
    kmeans_train form for cross-checking.

    Subspaces whose k-means dropped empty cells are RESEEDED back to
    exactly `k` codewords from a hash-ordered member pool (VERDICT r11
    #4 — the previous k_min truncation let the worst subspace shrink
    the whole product space), so every subspace codebook has k entries
    and the stitched result is always k full-dimension rows (corpus
    permitting: an input smaller than k still yields k rows by cycling
    the pool)."""
    if dim is None:
        first = vectors.select(embedding_col).filter(
            F.col(embedding_col).isNotNull()
        ).first()
        if first is None:
            raise ValueError("train_pq_codebook: no non-null embeddings")
        dim = len(first[0])
    if dim % n_subspaces:
        raise ValueError(
            f"train_pq_codebook: dim {dim} not divisible by {n_subspaces}"
        )
    ds = dim // n_subspaces
    if single_pass:
        sub_books = _train_pq_codebook_single_pass(
            vectors, n_subspaces, k, iters, dim, ds, id_col, embedding_col
        )
    else:
        sub_books = []
        for s in range(n_subspaces):
            sliced = vectors.select(
                F.col(id_col),
                F.slice(
                    F.col(embedding_col), s * ds + 1, ds
                ).alias(embedding_col),
            )
            _cells, book, _assigned = kmeans_train(
                sliced, k=k, iters=iters, id_col=id_col,
                embedding_col=embedding_col,
            )
            sub_books.append(book)
    if any(len(b) < k for b in sub_books):
        pool = _pq_reseed_pool(vectors, k, id_col, embedding_col)
        _reseed_sub_books(sub_books, pool, k, ds)
    k_out = min(len(b) for b in sub_books)  # == k unless the corpus is empty-ish
    return [
        [x for s in range(n_subspaces) for x in sub_books[s][j]]
        for j in range(k_out)
    ]


def _ivfpq_meta(spark, path: str) -> dict | None:
    """The index's stored dims contract (meta/ parquet, one row:
    n_subspaces, dim, has_vectors) or None for a pre-meta index. Without
    it a query or append run with the wrong --subspaces would produce
    codes[s] = NULL for every candidate and silently return arbitrary
    ids as top-k (ADVICE r11 #1) — every reader validates against it."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(path + "/meta").collect()
    except AnalysisException:
        return None
    return rows[0].asDict() if rows else None


def _write_ivfpq_meta(
    spark, path: str, n_subspaces: int, dim: int, has_vectors: bool
) -> None:
    local_rows_df(
        spark,
        "n_subspaces int, dim int, has_vectors boolean",
        [(int(n_subspaces), int(dim), bool(has_vectors))],
    ).write.mode("overwrite").parquet(path + "/meta")




def write_ivfpq_index(
    vectors: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    path: str,
    n_subspaces: int = 8,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    mode: str = "overwrite",
    store_vectors: bool | None = None,
) -> None:
    """Persist the IVFADC index: residual-PQ codes (pq_encode_residual,
    one fused Arrow pass) written PARTITIONED BY cell_id under `codes/`
    — 8 small ints per vector instead of the embedding, the ~64x
    compression that keeps a 100 TB corpus' index a ~1.5 TB store —
    plus the centroid and codebook dims under `centroids/` /
    `codebook/` and a one-row `meta/` contract (n_subspaces, dim,
    has_vectors) every reader and append validates against.
    mode='append' adds a split's codes (encode with the SAME centroid +
    codebook stores; a mismatched n_subspaces or dim raises instead of
    silently writing mixed-length code arrays). The compressed twin of
    write_ivf_index: queries prune to probed cell directories AND never
    read the raw embeddings.

    `store_vectors=True` additionally persists the raw vectors under
    `vectors/`, cell-partitioned like the codes (a second map-only
    assignment pass — bit-identical cells by the shared argmax kernel)
    so query_ivfpq_index(rerank_shortlist=...) can exact-re-rank the ADC
    shortlist from a probe-pruned scan. Default None follows the index's
    stored meta on append (an append may not silently stop maintaining a
    raw store that re-rank queries depend on) and False on overwrite."""
    from biocache_store_spark.util import hadoop_delete

    spark = vectors.sparkSession
    first = codebook.select(F.size(F.col(embedding_col)).alias("d")).first()
    if first is None:
        raise ValueError("write_ivfpq_index: empty codebook")
    dim = int(first["d"])
    if dim % n_subspaces:
        raise ValueError(
            f"write_ivfpq_index: codebook dim {dim} not divisible by "
            f"n_subspaces {n_subspaces}"
        )
    meta = _ivfpq_meta(spark, path) if mode == "append" else None
    if mode == "append":
        if meta is not None:
            if int(meta["n_subspaces"]) != int(n_subspaces):
                raise ValueError(
                    f"write_ivfpq_index: index at {path!r} stores "
                    f"n_subspaces={meta['n_subspaces']}, append requested "
                    f"{n_subspaces} — mixed code lengths would corrupt it"
                )
            if int(meta["dim"]) != dim:
                raise ValueError(
                    f"write_ivfpq_index: index at {path!r} stores dim="
                    f"{meta['dim']}, append codebook has dim {dim}"
                )
            if store_vectors is None:
                store_vectors = bool(meta["has_vectors"])
            elif bool(store_vectors) != bool(meta["has_vectors"]):
                raise ValueError(
                    f"write_ivfpq_index: index at {path!r} has "
                    f"has_vectors={meta['has_vectors']}; an append must "
                    "match (a diverging raw-vector store would silently "
                    "break rerank queries)"
                )
        elif store_vectors:
            # a vectors/ store born from an append would hold ONLY this
            # split — a later rerank query would silently drop every
            # seed-corpus candidate at the raw-vector join
            raise ValueError(
                f"write_ivfpq_index: index at {path!r} predates the meta "
                "contract; a raw-vector store cannot be added via append "
                "(it would miss the seed corpus) — rebuild with "
                "mode='overwrite', store_vectors=True"
            )
        else:
            store_vectors = False
    store_vectors = bool(store_vectors)
    encoded = pq_encode_residual(
        vectors.select(id_col, embedding_col), centroids, codebook,
        n_subspaces=n_subspaces, id_col=id_col, embedding_col=embedding_col,
    ).select(id_col, "cell_id", "codes")
    encoded.write.mode(mode).partitionBy("cell_id").parquet(path + "/codes")
    if store_vectors:
        # a second assignment pass rather than caching the encode output:
        # at corpus scale two map-only scans beat persisting N embeddings,
        # and ivf_assign_bulk shares pq_encode_residual's argmax kernel so
        # the cells are identical by construction
        assigned = ivf_assign_bulk(
            vectors.select(id_col, embedding_col), centroids,
            id_col, embedding_col,
        )
        if mode == "append":
            # one canonical element type per store: a float32 drop into a
            # float64 store (or vice versa) must not silently mix schemas
            # for parquet's widening read to paper over
            stored_type = (
                spark.read.parquet(path + "/vectors")
                .schema[embedding_col].dataType
            )
            assigned = assigned.withColumn(
                embedding_col, F.col(embedding_col).cast(stored_type)
            )
        assigned.write.mode(mode).partitionBy("cell_id").parquet(
            path + "/vectors"
        )
    elif mode == "overwrite":
        # a rebuild WITHOUT the raw store must not leave the previous
        # vectors/ (the ~64x-larger artifact) stranded on disk — meta
        # says has_vectors=False so nothing would ever read or reclaim it
        hadoop_delete(spark, path + "/vectors")
    if mode == "overwrite":
        centroids.write.mode("overwrite").parquet(path + "/centroids")
        codebook.write.mode("overwrite").parquet(path + "/codebook")
        # a full rebuild starts with a clean slate: tombstones refer to
        # the PREVIOUS corpus and would silently hide rebuilt rows
        hadoop_delete(spark, path + "/deleted")
    # meta is (re)written on overwrite and back-filled on a legacy append
    # (with the store_vectors=False this path enforces above)
    if mode == "overwrite" or meta is None:
        _write_ivfpq_meta(spark, path, n_subspaces, dim, store_vectors)


def _tombstone_ids(ids: DataFrame, path: str) -> None:
    """Append deduplicated ids to the index's `deleted/` store under a
    FIXED column name — the query-time id_col must not have to match
    whatever id_col the deleter happened to use (a mismatch would
    otherwise poison every query with a resolution error until
    deleted/ was fixed by hand)."""
    (
        ids.select(F.col(ids.columns[0]).alias("id"))
        .dropDuplicates()
        .write.mode("append")
        .parquet(path + "/deleted")
    )


def delete_from_ivfpq_index(
    spark, path: str, ids: DataFrame, id_col: str = "vec_id"
) -> None:
    """Tombstone deletion from the persisted IVFADC index — the ANN
    tier's member of the engine's delete family (the reference deletes
    records everywhere; an embedding index must honor the same request,
    e.g. a takedown or consent withdrawal). `ids` (first column = the
    ids to delete) appends to a tiny `deleted/` store; EVERY query path
    anti-joins it, so deleted vectors stop matching immediately without
    touching the cell-partitioned codes. Physical removal is
    `vacuum_ivfpq_index` (run it once tombstones grow past a broadcast-
    comfortable size, or on the maintenance cadence). NOTE: a tombstone
    hides ALL rows with that id — re-adding a deleted id requires a
    vacuum first (the append would land but stay invisible)."""
    _tombstone_ids(ids, path)


def delete_from_ivf_index(
    spark, path: str, ids: DataFrame, id_col: str = "vec_id"
) -> None:
    """Tombstone deletion from the persisted IVF index (the uncompressed
    sibling of delete_from_ivfpq_index, same contract): deleted vectors
    stop matching query_ivf_index — and therefore stop pruning arrivals
    in semantic_dedup_stream — immediately; vacuum_ivf_index physically
    removes them from `cells/`."""
    _tombstone_ids(ids, path)


def _ivfpq_tombstones(spark, path: str, id_col: str) -> DataFrame | None:
    """The index's deleted-id relation (None when nothing was ever
    deleted) — stored under the fixed column `id`, surfaced under the
    caller's id_col; deduplicated, broadcast-sized by the vacuum
    contract."""
    from biocache_store_spark.util import hadoop_exists

    if not hadoop_exists(spark, path + "/deleted"):
        return None
    return spark.read.parquet(path + "/deleted").select(
        F.col("id").alias(id_col)
    ).dropDuplicates()


def _vacuum_index_stores(
    spark, path: str, stores: list[str], primary: str, id_col: str
) -> dict:
    """The shared vacuum core: rewrite each cell-partitioned store under
    `path` without the tombstoned ids, then clear `deleted/`. Rewrites
    land in a `__vacuum` sibling first (mode=overwrite, so a crashed
    prior attempt's leftovers never block a retry) and swap in via
    rename with the RESULT CHECKED — Hadoop signals rename failure by
    returning false, and an unchecked false after the old store's
    delete would silently destroy the index. A vacuum that would empty
    the `primary` store entirely is refused (an all-rows-deleted index
    should be rebuilt, and an empty partitioned store is unreadable
    anyway). The one non-atomic window (between a store's delete and
    its rename) is recoverable by renaming the `__vacuum` directory
    into place by hand; `deleted/` is cleared only after EVERY store
    swapped. Returns per-store removed counts."""
    from biocache_store_spark.util import hadoop_delete, hadoop_fs

    tomb = _ivfpq_tombstones(spark, path, id_col)
    if tomb is None:
        return {f"removed_{s}": 0 for s in stores}
    removed = {}
    for store in stores:
        full = path + "/" + store
        df = spark.read.parquet(full)
        before = df.count()
        n_removed = df.join(
            F.broadcast(tomb), id_col, "left_semi"
        ).count()
        if store == primary and n_removed >= before:
            raise ValueError(
                f"index vacuum: every row of {full!r} is tombstoned — "
                "rebuild the index instead of vacuuming it empty"
            )
        keep = df.join(F.broadcast(tomb), id_col, "left_anti")
        keep.write.mode("overwrite").partitionBy("cell_id").parquet(
            full + "__vacuum"
        )
        fs, dst = hadoop_fs(spark, full)
        hadoop_delete(spark, full)
        _fs2, src = hadoop_fs(spark, full + "__vacuum")
        if not fs.rename(src, dst):
            raise RuntimeError(
                f"index vacuum: rename {full}__vacuum -> {full} failed; "
                "the rewritten store is intact at the __vacuum path — "
                "move it into place and re-run"
            )
        removed[f"removed_{store}"] = n_removed
    hadoop_delete(spark, path + "/deleted")
    return removed


def vacuum_ivfpq_index(spark, path: str, id_col: str = "vec_id") -> dict:
    """Physically remove tombstoned ids from the IVFADC index: rewrite
    `codes/` (and `vectors/` when the index stores raw vectors) without
    them, then clear `deleted/` — the shared `_vacuum_index_stores`
    safety contract (staged rewrite, checked rename, refuses emptying
    the codes store). Returns per-store removed counts."""
    meta = _ivfpq_meta(spark, path)
    stores = ["codes"]
    if meta is not None and meta.get("has_vectors"):
        stores.append("vectors")
    removed = _vacuum_index_stores(spark, path, stores, "codes", id_col)
    removed.setdefault("removed_vectors", 0)
    return removed


def vacuum_ivf_index(spark, path: str, id_col: str = "vec_id") -> dict:
    """Physically remove tombstoned ids from the IVF index's `cells/`
    store (same safety contract as vacuum_ivfpq_index)."""
    return _vacuum_index_stores(spark, path, ["cells"], "cells", id_col)


def _resolve_ivfpq_subspaces(
    spark, path: str, n_subspaces: int | None
) -> tuple[dict | None, int]:
    """Resolve a query's subspace count against the index's stored
    meta: None (the default) takes the meta value — so an m=16 index
    just works without the caller re-stating its geometry — and an
    explicit value that disagrees RAISES (mismatched subspace counts
    make codes[s] NULL for every candidate, which pre-guard silently
    returned arbitrary ids as top-k, ADVICE r11 #1). Pre-meta indexes
    fall back to 8 / skip the check (the in-plan F.size(codes) filter
    still applies). Returns (meta, n_subspaces) so callers read the
    meta parquet once."""
    meta = _ivfpq_meta(spark, path)
    if n_subspaces is None:
        return meta, (int(meta["n_subspaces"]) if meta is not None else 8)
    if meta is not None and int(meta["n_subspaces"]) != int(n_subspaces):
        raise ValueError(
            f"ivfpq query: index at {path!r} stores n_subspaces="
            f"{meta['n_subspaces']}, query requested {n_subspaces}"
        )
    return meta, int(n_subspaces)


def _ivfpq_rerank_vectors(
    spark, path: str, probe_cells: list, id_col: str,
    exclude_ids: DataFrame | None, meta: dict | None,
) -> DataFrame:
    """The probe-pruned raw-vector relation the re-rank stage scores
    against: the index's cell-partitioned `vectors/` store filtered to
    the probed cells (directory pruning, same placement discipline as
    the codes scan: filter BELOW the defensive dropDuplicates), with the
    same crash-replay dedup and exclude_ids contract as the ADC side.
    `meta` is the caller's already-loaded index meta (None = pre-meta)."""
    if meta is not None and not meta.get("has_vectors"):
        raise ValueError(
            f"ivfpq rerank: index at {path!r} has no raw-vector store; "
            "build it with write_ivfpq_index(store_vectors=True)"
        )
    vec = (
        spark.read.parquet(path + "/vectors")
        .filter(F.col("cell_id").isin(probe_cells))
        .dropDuplicates([id_col])
    )
    if exclude_ids is not None:
        vec = vec.join(
            exclude_ids.select(F.col(exclude_ids.columns[0]).alias(id_col)),
            id_col,
            "left_anti",
        )
    return vec


def query_ivfpq_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    n_subspaces: int | None = None,
    id_col: str = "vec_id",
    exclude_ids: DataFrame | None = None,
    rerank_shortlist: int | None = None,
) -> DataFrame:
    """ADC top-k against the persisted IVFADC index: the centroid and
    codebook dims are read once (small by contract), the query's probed
    cells land in the scan as a cell_id IN (...) filter — directory
    pruning, test-asserted — and scoring reads ONLY the int codes.
    n_subspaces defaults to the index's stored meta (an explicit
    mismatching value raises instead of silently returning arbitrary
    ids).

    Default: (id, approx_dist, rank), identical to ivfpq_topk over the
    same encoded relation (equivalence-tested). With
    `rerank_shortlist=S` the ADC stage returns its top-S shortlist and
    the final top-k is EXACT cosine over the index's cell-partitioned
    raw-vector store (write_ivfpq_index(store_vectors=True)), also
    probe-pruned — the measured-recall production recipe (SCALE.md 'ANN
    recall': re-rank lifted 1M recall@10 0.28 -> 0.735 at per-subspace
    codebooks), returning (id, cos_sim, rank)."""
    meta, n_subspaces = _resolve_ivfpq_subspaces(spark, path, n_subspaces)
    centroids = spark.read.parquet(path + "/centroids")
    codebook = spark.read.parquet(path + "/codebook")
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(centroids.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"]
        for r in sorted(codebook.collect(), key=lambda r: r["j"])
    ]
    # probe FIRST and filter the scan before the defensive
    # dropDuplicates: an aggregate above the filter would block the
    # cell_id IN (...) predicate from reaching PartitionFilters and the
    # whole codes store would be read + shuffled (the pruning is
    # test-asserted on this function's actual plan)
    probed = _ivfpq_probe_cells(
        [float(x) for x in query_vec], cent_rows, nprobe
    )
    probe_cells = [c for _s, c, _v in probed]
    encoded = (
        spark.read.parquet(path + "/codes")
        .filter(F.col("cell_id").isin(probe_cells))
        .dropDuplicates([id_col])
    )
    if exclude_ids is not None:
        # the never-match contract shared with query_ivf_index's
        # exclude_ids (e.g. a query from the indexed corpus excluding
        # ITSELF so top-k is k real neighbors, not rank-1 = itself)
        encoded = encoded.join(
            exclude_ids.select(F.col(exclude_ids.columns[0]).alias(id_col)),
            id_col,
            "left_anti",
        )
    tomb = _ivfpq_tombstones(spark, path, id_col)
    if tomb is not None:
        # tombstoned ids stop matching immediately; excluding them from
        # the ADC side suffices for the rerank path too (its raw-vector
        # join is an inner join on the shortlist, which can't resurrect
        # an id absent here)
        encoded = encoded.join(F.broadcast(tomb), id_col, "left_anti")
    if rerank_shortlist is None:
        return ivfpq_topk(
            encoded, query_vec, cent_rows, book_rows,
            k=k, nprobe=nprobe, n_subspaces=n_subspaces, id_col=id_col,
        )
    vectors = _ivfpq_rerank_vectors(
        spark, path, probe_cells, id_col, exclude_ids, meta
    )
    return ivfpq_topk_rerank(
        encoded, vectors, query_vec, cent_rows, book_rows,
        k=k, shortlist=rerank_shortlist, nprobe=nprobe,
        n_subspaces=n_subspaces, id_col=id_col,
    )


def query_ivfpq_index_batch(
    spark,
    path: str,
    query_vectors: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    n_subspaces: int | None = None,
    id_col: str = "vec_id",
    rerank_shortlist: int | None = None,
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch ADC top-k against the persisted IVFADC index: ONE job for
    the whole query batch (ivfpq_topk_batch's broadcast table-relation
    join — 0.14 s/query at 1M vs 5.4 s/query for per-query plans,
    SCALE.md). The union of every query's probed cells lands in the
    codes scan as cell_id IN (...) BEFORE the defensive dropDuplicates,
    so partition pruning holds; self-matches are excluded by the batch
    kernel (ivf_topk's convention); n_subspaces defaults to the stored
    meta (an explicit mismatch raises). The query batch is collected ONCE and that
    snapshot feeds both the probe-cell union and the ADC tables (a
    second collect of a non-deterministic relation could probe cells
    absent from the scan filter — ADVICE r11 #2). query_vectors:
    (query_id, embedding). Returns (query_id, id, approx_dist, rank),
    or (query_id, id, cos_sim, rank) with `rerank_shortlist=S` (exact
    cosine over the raw-vector store, as query_ivfpq_index)."""
    meta, n_subspaces = _resolve_ivfpq_subspaces(spark, path, n_subspaces)
    centroids = spark.read.parquet(path + "/centroids")
    codebook = spark.read.parquet(path + "/codebook")
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(centroids.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"]
        for r in sorted(codebook.collect(), key=lambda r: r["j"])
    ]
    qrows = query_vectors.select("query_id", "embedding").collect()
    probed_cells = sorted({
        cell
        for qr in qrows
        for _cs, cell, _c in _ivfpq_probe_cells(
            [float(x) for x in qr["embedding"]], cent_rows, nprobe
        )
    })
    encoded = (
        spark.read.parquet(path + "/codes")
        .filter(F.col("cell_id").isin(probed_cells))
        .dropDuplicates([id_col])
    )
    if exclude_ids is not None:
        # the never-match contract shared with query_ivfpq_index (e.g. a
        # streaming microbatch excluding ITSELF so a crash-replay after
        # its own append reports identical neighbors)
        encoded = encoded.join(
            exclude_ids.select(F.col(exclude_ids.columns[0]).alias(id_col)),
            id_col,
            "left_anti",
        )
    tomb = _ivfpq_tombstones(spark, path, id_col)
    if tomb is not None:
        # see query_ivfpq_index: the ADC-side anti-join covers the
        # rerank path too (inner join on the shortlist)
        encoded = encoded.join(F.broadcast(tomb), id_col, "left_anti")
    # rebuild the query relation from the SAME collected snapshot so the
    # ADC tables can never diverge from the probe-cell filter above
    snapshot = arrow_rows_df(
        spark, query_vectors.select("query_id", "embedding").schema, qrows
    )
    if rerank_shortlist is None:
        return ivfpq_topk_batch(
            encoded, snapshot, cent_rows, book_rows,
            k=k, nprobe=nprobe, n_subspaces=n_subspaces, id_col=id_col,
            qrows=qrows,
        )
    vectors = _ivfpq_rerank_vectors(
        spark, path, probed_cells, id_col, exclude_ids, meta
    )
    return ivfpq_topk_batch_rerank(
        encoded, vectors, snapshot, cent_rows, book_rows,
        k=k, shortlist=rerank_shortlist, nprobe=nprobe,
        n_subspaces=n_subspaces, id_col=id_col, qrows=qrows,
    )


def centroids_df(
    spark, cells: list, book: list[list[float]], id_type=None
) -> DataFrame:
    """(cell_id, centroid) DataFrame from kmeans_train's (cells, book)
    output — the store format semantic_dedup / ivf_* / the CLI consume.
    Pass `id_type` (the source id column's Spark DataType) to carry the
    exact type through; otherwise it is inferred from the values
    (int -> long, str -> string, float -> double)."""
    from pyspark.sql import types as T

    if id_type is None:
        if all(isinstance(c, bool) is False and isinstance(c, int) for c in cells):
            id_type = T.LongType()
        elif all(isinstance(c, float) for c in cells):
            id_type = T.DoubleType()
        else:
            id_type = T.StringType()
    schema = T.StructType(
        [
            T.StructField("cell_id", id_type),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )
    return arrow_rows_df(spark, schema, list(zip(cells, book)))


def semantic_decontamination(
    train: DataFrame,
    eval_set: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = DEFAULT_PLANES,
    max_bucket: int = 100_000,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic twin of
    operators/curation.py ngram_overlap: for every training vector that
    shares a random-hyperplane bucket with an evaluation vector, report
    its closest eval neighbor and flag cosine >= threshold (a paraphrased
    eval item that n-gram overlap misses). Candidate generation is the
    cross-set join WITHIN buckets only — never train x eval all-pairs,
    and never train x train (dedup's job, not this one's).

    Scale shape: eval sets are small by construction but are NOT assumed
    broadcastable — the join is bucket-keyed shuffle-hash like
    cosine_near_duplicates, and the cap drops buckets whose EVAL side
    exceeds max_bucket (the train side may be arbitrarily hot; cost per
    bucket is |train| x |eval|, so bounding the eval side bounds the
    fan-out per training row). The argmax is ordered by the ROUNDED
    cosine then eval id, so the reported neighbor reproduces exactly in
    SQL (full-precision ordering would tie-break on engine ulps).

    Returns (id, eval_id, cos_sim, contaminated) — one row per training
    vector that had at least one same-bucket eval candidate; vectors
    with no candidate are clean by construction and absent.
    """
    from pyspark.sql.window import Window

    planes = hyperplanes(dim, n_planes)
    t = train.select(
        F.col(id_col), F.col(embedding_col).alias("__emb_t")
    ).withColumn("bucket", _bucket_expr(F.col("__emb_t"), planes))
    e = eval_set.select(
        F.col(id_col).alias("eval_id"),
        F.col(embedding_col).alias("__emb_e"),
    ).withColumn("bucket", _bucket_expr(F.col("__emb_e"), planes))
    sizes = e.groupBy("bucket").agg(F.count(F.lit(1)).alias("__n"))
    e = e.join(
        F.broadcast(sizes.filter(F.col("__n") <= max_bucket)), "bucket"
    ).drop("__n")
    sim = cosine_similarity_arrow(F.col("__emb_t"), F.col("__emb_e"))
    cand = (
        t.join(e.hint("shuffle_hash"), ["bucket"])
        .withColumn("cos_sim", F.round(F.coalesce(sim, F.lit(-2.0)), 4))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col("eval_id").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            "eval_id",
            "cos_sim",
            (F.col("cos_sim") >= threshold).alias("contaminated"),
        )
    )
