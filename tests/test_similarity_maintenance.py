"""ANN similarity search + table maintenance ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hyperplanes_deterministic():
    from biocache_store_spark.operators.similarity import hyperplanes

    a = hyperplanes(8, 4)
    b = hyperplanes(8, 4)
    assert a == b
    assert all(-1.0 <= v <= 1.0 for row in a for v in row)
    assert hyperplanes(8, 4, seed="other") != a


def test_ann_recall_vs_brute_force(spark):
    from biocache_store_spark.operators.similarity import ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = {
        r["vec_id"] for r in ann_topk(emb, queries, dim=64, k=10).collect()
    }
    assert len(approx) == 10

    # brute-force top-10 for the same query
    from biocache_store_spark.functions.vectors import cosine_similarity

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    exact = {
        r["vec_id"]
        for r in (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .withColumn("s", cosine_similarity(F.col("embedding"), F.col("q_emb")))
            .orderBy(F.col("s").desc())
            .limit(10)
            .collect()
        )
    }
    # random 64-dim data has near-uniform similarities, so bucket recall is
    # inherently modest; assert overlap exists AND the approximate
    # neighbors are nearly as close as the exact ones (the honest ANN
    # quality contract)
    recall = len(approx & exact) / 10
    assert recall >= 0.1

    def mean_sim(ids):
        rows = (
            emb.filter(F.col("vec_id").isin(*ids))
            .crossJoin(F.broadcast(q))
            .withColumn("s", cosine_similarity(F.col("embedding"), F.col("q_emb")))
            .agg(F.avg("s"))
            .collect()
        )
        return rows[0][0]

    # population mean similarity on random data is ~0; bucketed candidates
    # must be far above it even when exact-top-10 overlap is modest
    assert mean_sim(approx) >= 0.15


def test_delete_by_keys(spark):
    from biocache_store_spark.operators.maintenance import delete_by_keys

    table = spark.createDataFrame(
        [("k1", "a"), ("k2", "b"), ("k3", "c")], "rowKey string, v string"
    )
    keys = spark.createDataFrame([("k2",)], "k string")
    remaining, log = delete_by_keys(table, keys)
    assert {r["rowKey"] for r in remaining.collect()} == {"k1", "k3"}
    assert [r["deleted_key"] for r in log.collect()] == ["k2"]


def test_delete_by_query(spark):
    from biocache_store_spark.operators.maintenance import delete_by_query

    table = spark.createDataFrame(
        [("k1", "Victoria"), ("k2", "Tasmania")], "rowKey string, state string"
    )
    remaining, log = delete_by_query(table, "state:Tasmania")
    assert [r["rowKey"] for r in remaining.collect()] == ["k1"]
    assert [r["deleted_key"] for r in log.collect()] == ["k2"]


def test_upsert(spark):
    from biocache_store_spark.operators.maintenance import upsert

    table = spark.createDataFrame(
        [("k1", "old", 1), ("k2", "keep", 1)], "rowKey string, v string, ver int"
    )
    updates = spark.createDataFrame(
        [("k1", "new", 2), ("k3", "ins", 1)], "rowKey string, v string, ver int"
    )
    out = {r["rowKey"]: r["v"] for r in upsert(table, updates, version_col="ver").collect()}
    assert out == {"k1": "new", "k2": "keep", "k3": "ins"}
    # without version column updates still win
    out2 = {r["rowKey"]: r["v"] for r in upsert(table, updates).collect()}
    assert out2["k1"] == "new"


def test_ivf_topk_recall_and_partition_pruning_shape(spark):
    """IVF with externally supplied centroids: k results per query, ranked
    by exact cosine within the probed cells; raising nprobe to the full
    cell count recovers the exact brute-force top-k."""
    from biocache_store_spark.functions.vectors import cosine_similarity
    from biocache_store_spark.operators.similarity import ivf_assign, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # every vector lands in exactly one cell
    assigned = ivf_assign(emb, centroids)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("cell_id").distinct().count() <= 8

    approx = ivf_topk(emb, queries, centroids, k=10, nprobe=2)
    rows = approx.collect()
    assert len(rows) == 10
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 11)
    )

    # nprobe = all cells ==> exhaustive ==> equals brute-force top-10
    full = {
        r["vec_id"]
        for r in ivf_topk(emb, queries, centroids, k=10, nprobe=8).collect()
    }
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    exact = {
        r["vec_id"]
        for r in (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .withColumn("s", cosine_similarity(F.col("embedding"), F.col("q_emb")))
            .orderBy(F.col("s").desc(), F.col("vec_id").asc())
            .limit(10)
            .collect()
        )
    }
    assert full == exact


def test_ann_recall_floor_ivf_and_pq(spark):
    """Recall@10 quality gate (VERDICT r10 #6): the IVF and PQ paths are
    approximate-by-design, so a quantizer/probe regression would not
    break the hash-exact oracle queries — it would silently degrade
    recall. This pins recall@10 vs exact cosine above measured floors
    at fixed params on a clustered synthetic corpus (16 Gaussian
    clusters, unit-normalized, per-coord noise 0.15): measured on this
    config ivf nprobe=1 -> 0.89, nprobe=2 -> 1.0, pq 8x16 -> 0.32;
    floors leave margin for BLAS-order ties in the NumPy ground truth.
    The full nprobe sweep at 1M vectors lives in
    tools/bench_ann_recall.py (SCALE.md 'ANN recall')."""
    import numpy as np

    from biocache_store_spark.operators.similarity import (
        ivf_assign_bulk,
        ivf_topk,
        kmeans_train,
        pq_encode,
        pq_topk,
    )

    n, dim, n_clusters, noise, k = 4000, 32, 16, 0.15, 10
    rng = np.random.RandomState(11)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    V = centers[rng.randint(0, n_clusters, size=n)]
    V = V + noise * rng.standard_normal((n, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    q_ids = np.linspace(0, n - 1, 10, dtype=np.int64)
    gt = {}
    for qid in q_ids:
        sims = V @ V[qid]
        sims[qid] = -np.inf
        top = np.argpartition(-sims, k)[:k]
        gt[int(qid)] = set(
            int(i) for i in sorted(top, key=lambda i: (-sims[i], i))[:k]
        )

    vectors = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in q_ids],
        "query_id long, embedding array<double>",
    )
    _cells, centroids, _assigned = kmeans_train(vectors, k=16, iters=2)
    cent_df = spark.createDataFrame(
        [(j, centroids[j]) for j in range(len(centroids))],
        "cell_id long, centroid array<double>",
    )
    assigned = ivf_assign_bulk(vectors, cent_df).cache()
    rec = {}
    for nprobe in (1, 2):
        out = ivf_topk(
            vectors, queries, cent_df, k=k, nprobe=nprobe, assigned=assigned
        ).collect()
        got: dict[int, set[int]] = {}
        for r in out:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec[nprobe] = float(
            np.mean([len(got.get(q, set()) & gt[q]) / k for q in gt])
        )
    assert rec[2] >= rec[1]  # recall is monotone in probes
    assert rec[1] >= 0.7, rec
    assert rec[2] >= 0.9, rec

    book_df = cent_df.select(
        F.col("cell_id").alias("j"), F.col("centroid").alias("embedding")
    )
    encoded = pq_encode(vectors, book_df, n_subspaces=8).cache()
    hits = []
    for qid in [int(q) for q in q_ids[:5]]:
        out = pq_topk(
            encoded.filter(F.col("vec_id") != qid),
            [float(x) for x in V[qid]],
            centroids,
            k=k,
            n_subspaces=8,
        ).collect()
        hits.append(len({r["vec_id"] for r in out} & gt[qid]) / k)
    assert float(np.mean(hits)) >= 0.2, hits

    # IVFADC + exact re-rank floor (VERDICT r11 #3, the engine-surface
    # recipe): per-subspace residual codebook, nprobe=2, re-rank of the
    # ADC top-100 — measured 0.93 on this config (raw ADC 0.41); floors
    # at 0.8 / 0.25 leave margin for ground-truth BLAS-order ties. The
    # 1M sweep (SCALE.md round 12) shows the same shape: shortlist is
    # the binding lever, re-rank must beat raw ADC decisively.
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_batch,
        ivfpq_topk_batch_rerank,
        pq_encode_residual,
        train_pq_codebook,
    )

    C = np.asarray(centroids)
    cell_of = {
        r["vec_id"]: r["cell_id"]
        for r in assigned.select("vec_id", "cell_id").collect()
    }
    R = V - C[[cell_of[i] for i in range(n)]]
    resid = spark.createDataFrame(
        [(int(i), [float(x) for x in R[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    rbook = train_pq_codebook(resid, n_subspaces=8, k=16, iters=2)
    rbook_df = spark.createDataFrame(
        [(j, rbook[j]) for j in range(len(rbook))],
        "j long, embedding array<double>",
    )
    enc_r = pq_encode_residual(
        vectors, cent_df.select("cell_id", "centroid"), rbook_df,
        n_subspaces=8,
    ).select("vec_id", "cell_id", "codes").cache()
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cent_df.collect(), key=lambda r: r["cell_id"])
    ]

    def batch_recall(df):
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return float(
            np.mean([len(got.get(q, set()) & gt[q]) / k for q in gt])
        )

    raw_adc = batch_recall(ivfpq_topk_batch(
        enc_r, queries, cent_rows, rbook, k=k, nprobe=2, n_subspaces=8
    ))
    reranked = batch_recall(ivfpq_topk_batch_rerank(
        enc_r, vectors, queries, cent_rows, rbook,
        k=k, shortlist=100, nprobe=2, n_subspaces=8,
    ))
    assert raw_adc >= 0.25, raw_adc
    assert reranked >= 0.8, reranked
    assert reranked > raw_adc, (reranked, raw_adc)


def test_ivfpq_batch_matches_single_query_form(spark):
    """ivfpq_topk_batch (broadcast ADC-table relation + subspace pivot)
    is bit-identical per query to ivfpq_topk's when-chain form — the
    pivot's one-row-per-subspace F.sum must not introduce any
    accumulation-order drift."""
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_batch,
        pq_encode_residual,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    enc = pq_encode_residual(emb.select("vec_id", "embedding"), cents, book)
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
    batch = {
        (r["query_id"], r["vec_id"], r["approx_dist"], r["rank"])
        for r in ivfpq_topk_batch(
            enc, queries, cent_rows, book_rows, k=5, nprobe=2
        ).collect()
    }
    assert len(batch) == 15
    for qid in range(3):
        qvec = emb.filter(F.col("vec_id") == qid).select("embedding").collect()[0][0]
        single = {
            (qid, r["vec_id"], r["approx_dist"], r["rank"])
            for r in ivfpq_topk(
                enc.filter(F.col("vec_id") != qid), qvec, cent_rows,
                book_rows, k=5, nprobe=2,
            ).collect()
        }
        assert single == {t for t in batch if t[0] == qid}, qid


def test_ivfpq_rerank_recovers_exact_topk_at_full_shortlist(spark):
    """ivfpq_topk_rerank (ADC shortlist -> exact-cosine re-rank, Jegou
    §V-A IVFADC+R): with nprobe = all cells and shortlist = the whole
    corpus, the re-ranked top-k must equal the brute-force cosine top-k
    exactly — the ADC stage then only prunes nothing and the exact stage
    is the whole ranking. Also pins the output contract (cos_sim 4dp,
    rank 1..k, shortlist < k refused)."""
    from biocache_store_spark.functions.vectors import cosine_similarity_arrow
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_rerank,
        pq_encode_residual,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    body = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    enc = pq_encode_residual(body, cents, book)
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    n = body.count()
    out = ivfpq_topk_rerank(
        enc, body, qvec, cent_rows, book_rows, k=5, shortlist=n, nprobe=4
    ).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5,
    ]
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    exact = (
        body.crossJoin(F.broadcast(q))
        .withColumn(
            "cs", cosine_similarity_arrow(F.col("embedding"), F.col("q_emb"))
        )
        .orderBy(F.col("cs").desc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    )
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        r["vec_id"] for r in exact
    ]
    assert all(abs(a["cos_sim"] - round(b["cs"], 4)) < 1e-12
               for a, b in zip(sorted(out, key=lambda r: r["rank"]), exact))
    with pytest.raises(ValueError, match="shortlist"):
        ivfpq_topk_rerank(
            enc, body, qvec, cent_rows, book_rows, k=5, shortlist=3
        )


def test_ivfpq_batch_rerank_matches_single_form(spark):
    """ivfpq_topk_batch_rerank is bit-identical per query to
    ivfpq_topk_rerank — the broadcast shortlist join and per-query
    exact re-rank must not drift from the single-query composition."""
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_batch_rerank,
        ivfpq_topk_rerank,
        pq_encode_residual,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    allv = emb.select("vec_id", "embedding")
    enc = pq_encode_residual(allv, cents, book)
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
    batch = {
        (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
        for r in ivfpq_topk_batch_rerank(
            enc, allv, queries, cent_rows, book_rows,
            k=5, shortlist=20, nprobe=2,
        ).collect()
    }
    assert len(batch) == 15
    for qid in range(3):
        qvec = (
            emb.filter(F.col("vec_id") == qid)
            .select("embedding").collect()[0][0]
        )
        single = {
            (qid, r["vec_id"], r["cos_sim"], r["rank"])
            for r in ivfpq_topk_rerank(
                enc.filter(F.col("vec_id") != qid), allv, qvec,
                cent_rows, book_rows, k=5, shortlist=20, nprobe=2,
            ).collect()
        }
        assert single == {t for t in batch if t[0] == qid}, qid


def test_ivfpq_batch_rejects_duplicate_query_ids(spark):
    """A duplicated query_id would double every approx_dist through the
    per-subspace F.sum (two identical ADC-table rows match the join) —
    the batch kernel refuses instead of silently mis-reporting."""
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_batch,
        pq_encode_residual,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 2) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    enc = pq_encode_residual(emb.select("vec_id", "embedding"), cents, book)
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="duplicate query_id"):
        ivfpq_topk_batch(
            enc, q.union(q), cent_rows, book_rows, k=3, nprobe=1
        )


def test_train_pq_codebook_single_pass_parity_and_reseed(spark):
    """VERDICT r11 #4/#5: (a) the single-pass trainer (one assignment +
    stats job per iteration for all m subspaces) is bit-identical to the
    m-sequential kmeans_train form; (b) a degenerate subspace (constant
    slice -> every cell but one drops empty) is reseeded back to the
    full K instead of truncating every other subspace to k_min — and the
    reseed is itself deterministic (both trainers agree)."""
    from biocache_store_spark.operators.similarity import train_pq_codebook

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    seq = train_pq_codebook(emb, n_subspaces=8, k=4, iters=2, single_pass=False)
    one = train_pq_codebook(emb, n_subspaces=8, k=4, iters=2, single_pass=True)
    assert seq == one and len(one) == 4

    # constant first subspace: its k-means collapses to one cell
    degenerate = emb.select(
        "vec_id",
        F.concat(
            F.array(*[F.lit(0.5)] * 8), F.slice("embedding", 9, 56)
        ).alias("embedding"),
    )
    d_seq = train_pq_codebook(
        degenerate, n_subspaces=8, k=4, iters=1, single_pass=False
    )
    d_one = train_pq_codebook(
        degenerate, n_subspaces=8, k=4, iters=1, single_pass=True
    )
    assert len(d_one) == 4  # full K despite the collapsed subspace
    assert d_seq == d_one
    # the healthy subspaces (identical slices in both inputs) kept their
    # trained centroids — reseeding one subspace must not perturb others
    healthy = train_pq_codebook(emb, n_subspaces=8, k=4, iters=1)
    for j in range(4):
        assert d_one[j][8:] == healthy[j][8:], j


def test_train_pq_codebook_is_stitched_subspace_kmeans(spark):
    """train_pq_codebook == per-subspace kmeans_train stitched: codeword
    j's subspace-s slice must equal subspace-s centroid j, and encoding
    with the stitched book must equal per-subspace argmin against the
    subspace books (pq_encode slices the full-dim rows, so this holds by
    construction — the test pins the stitching orientation)."""
    from biocache_store_spark.operators.similarity import (
        kmeans_train,
        train_pq_codebook,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    book = train_pq_codebook(emb, n_subspaces=8, k=4, iters=1)
    assert book and all(len(row) == 64 for row in book)
    # subspace 3's slice of codeword 1 == that subspace's own kmeans
    sliced = emb.select(
        "vec_id", F.slice(F.col("embedding"), 3 * 8 + 1, 8).alias("embedding")
    )
    _c, sub_book, _a = kmeans_train(sliced, k=4, iters=1)
    for j in range(len(book)):
        assert book[j][24:32] == sub_book[j], j


def test_pq_encode_residual_parity_with_composed_path(spark):
    """The fused IVFADC encoder (assign + residual + encode in one
    Arrow pass) is bit-identical to the composed path — ivf_assign_bulk,
    driver-side residual subtraction, pq_encode — on real embeddings,
    and ivfpq_topk's rank-1 neighbor beats standalone pq_topk's ADC
    distance degeneracy check: probed-cell candidates only."""
    import numpy as np

    from biocache_store_spark.operators.similarity import (
        ivf_assign_bulk,
        ivfpq_topk,
        pq_encode,
        pq_encode_residual,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    book = emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("j"), "embedding"
    )
    body = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    fused = {r["vec_id"]: r for r in pq_encode_residual(body, cents, book).collect()}

    assigned = ivf_assign_bulk(body, cents).collect()
    cmap = {r["cell_id"]: np.asarray(r["centroid"]) for r in cents.collect()}
    resid = spark.createDataFrame(
        [
            (r["vec_id"],
             [float(x) for x in np.asarray(r["embedding"]) - cmap[r["cell_id"]]])
            for r in assigned
        ],
        "vec_id long, embedding array<double>",
    )
    composed_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(resid, book, n_subspaces=8).collect()
    }
    composed_cells = {r["vec_id"]: r["cell_id"] for r in assigned}
    for v, r in fused.items():
        assert list(r["codes"]) == composed_codes[v], v
        assert r["cell_id"] == composed_cells[v], v

    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cents.collect(), key=lambda r: r["cell_id"])
    ]
    book_rows = [
        r["embedding"] for r in sorted(book.collect(), key=lambda r: r["j"])
    ]
    enc_df = pq_encode_residual(body, cents, book)
    out = ivfpq_topk(enc_df, qvec, cent_rows, book_rows, k=10, nprobe=2)
    rows = out.collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 11)
    )
    # candidates come only from the 2 probed cells
    probed = set()
    qa = np.asarray(qvec)
    cs = {
        c: float(qa @ np.asarray(v) / (np.linalg.norm(qa) * np.linalg.norm(v)))
        for c, v in cent_rows
    }
    probed = {c for c in sorted(cs, key=lambda c: (-cs[c], c))[:2]}
    cells_of = {v: r["cell_id"] for v, r in fused.items()}
    assert all(cells_of[r["vec_id"]] in probed for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_arrow_cosine_bit_identical_to_hof(spark):
    """The Arrow tier must reproduce the HOF tier bit-for-bit: identical
    per-dimension left-assoc accumulation order (functions/vectors.py),
    so swapping tiers can never flip an oracle hash."""
    from biocache_store_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_arrow,
        norm,
        norm_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    both = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("hof"),
            cosine_similarity_arrow(F.col("embedding"), F.col("q_emb")).alias("arrow"),
            norm(F.col("embedding")).alias("n_hof"),
            norm_arrow(F.col("embedding")).alias("n_arrow"),
        )
        .collect()
    )
    assert len(both) > 0
    for r in both:
        assert r["hof"] == r["arrow"], (r["vec_id"], r["hof"], r["arrow"])
        assert r["n_hof"] == r["n_arrow"], (r["vec_id"], r["n_hof"], r["n_arrow"])


def test_arrow_cosine_null_inputs(spark):
    from biocache_store_spark.functions.vectors import cosine_similarity_arrow

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [3.0, 4.0]), (2, None, [3.0, 4.0]), (3, [1.0, 2.0], None)],
        "id int, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: r["cs"]
        for r in df.select(
            "id", cosine_similarity_arrow(F.col("a"), F.col("b")).alias("cs")
        ).collect()
    }
    assert rows[1] is not None
    assert rows[2] is None and rows[3] is None


def test_cleanup_rows_delete_and_reinstate(spark):
    from biocache_store_spark.operators.maintenance import cleanup_rows

    table = spark.createDataFrame(
        [
            # stale + live -> deleted
            ("r1", "dr1", "2024-01-01T00:00:00Z", ""),
            # fresh + deleted -> reinstated
            ("r2", "dr1", "2024-06-01T00:00:00Z", "2024-02-02T00:00:00Z"),
            # no lastModified -> deleted unconditionally
            ("r3", "dr1", None, ""),
            # stale + already deleted -> unchanged (keeps original date)
            ("r4", "dr1", "2024-01-01T00:00:00Z", "2024-02-02T00:00:00Z"),
            # other resource -> untouched even though stale
            ("r5", "dr2", "2024-01-01T00:00:00Z", ""),
        ],
        "rowKey string, dataResourceUid string, lastModifiedTime string, deleted string",
    )
    out, changes = cleanup_rows(
        table, "dr1", "2024-05-01T00:00:00Z", delete_time="2024-07-01T00:00:00Z"
    )
    flags = {r["rowKey"]: r["deleted"] for r in out.collect()}
    assert flags["r1"] == "2024-07-01T00:00:00Z"
    assert flags["r2"] == ""
    assert flags["r3"] == "2024-07-01T00:00:00Z"
    assert flags["r4"] == "2024-02-02T00:00:00Z"
    assert flags["r5"] == ""
    acts = {r["rowKey"]: r["action"] for r in changes.collect()}
    assert acts == {"r1": "deleted", "r3": "deleted", "r2": "reinstated"}


def test_cleanup_columns_keep_and_delete_lists(spark):
    from biocache_store_spark.operators.maintenance import cleanup_columns

    table = spark.createDataFrame(
        [
            ("r1", "dr1", "cat1", "loc1", 1),
            ("r2", "dr1", None, "loc2", 2),
            ("r3", "dr2", "cat3", "loc3", 3),
        ],
        "rowKey string, dataResourceUid string, catalogNumber string,"
        " locality string, version int",
    )
    # keep-list: only locality survives on dr1 rows; protected cols stay
    out, report = cleanup_columns(table, "dr1", ["locality"], keep=True)
    rows = {r["rowKey"]: r for r in out.collect()}
    assert rows["r1"]["catalogNumber"] is None and rows["r1"]["version"] is None
    assert rows["r1"]["locality"] == "loc1" and rows["r1"]["rowKey"] == "r1"
    assert rows["r3"]["catalogNumber"] == "cat3"  # other resource untouched
    rep = {r["column"]: r["records_cleared"] for r in report.collect()}
    assert rep == {"catalogNumber": 1, "version": 2}  # r2's catalogNumber was null
    # delete-list: exactly the listed column clears; schema/dtypes keep
    out2, _ = cleanup_columns(table, "dr1", ["version"], keep=False)
    rows2 = {r["rowKey"]: r for r in out2.collect()}
    assert rows2["r1"]["version"] is None and rows2["r1"]["catalogNumber"] == "cat1"
    assert dict(out2.dtypes)["version"] == "int"


def test_cleanup_columns_all_resources(spark):
    """data_resource_uid=None clears the columns on EVERY record — the
    whole-table DeleteLocalColumn variant."""
    from biocache_store_spark.operators.maintenance import cleanup_columns

    table = spark.createDataFrame(
        [("r1", "dr1", "cat1"), ("r3", "dr2", "cat3")],
        "rowKey string, dataResourceUid string, catalogNumber string",
    )
    out, report = cleanup_columns(table, None, ["catalogNumber"], keep=False)
    assert {r["catalogNumber"] for r in out.collect()} == {None}
    rep = {r["column"]: r["records_cleared"] for r in report.collect()}
    assert rep == {"catalogNumber": 2}


def test_rename_columns_merge_semantics(spark):
    """rename_columns (tool/RenameColumns.scala): values move to the new
    name, the old column drops; when the new name already exists, a
    record's old value wins where present and the existing new value
    survives where the old cell was absent; absent olds and identity
    pairs are no-ops."""
    from biocache_store_spark.operators.maintenance import rename_columns

    table = spark.createDataFrame(
        [("r1", "1.5", None), ("r2", None, "2.5"), ("r3", "3.0", "9.9")],
        "rowKey string, aus1 string, cl22 string",
    )
    out = rename_columns(
        table, {"aus1": "cl22", "missing_col": "cl99", "rowKey": "rowKey"}
    )
    assert "aus1" not in out.columns and "cl99" not in out.columns
    rows = {r["rowKey"]: r["cl22"] for r in out.collect()}
    assert rows == {"r1": "1.5", "r2": "2.5", "r3": "3.0"}
    # plain rename when the target does not exist yet
    out2 = rename_columns(table, {"aus1": "cl23"})
    assert "cl23" in out2.columns and "aus1" not in out2.columns
    assert {r["cl23"] for r in out2.collect()} == {"1.5", None, "3.0"}


def test_rename_columns_simultaneous_chain_and_swap(spark):
    """The mapping applies SIMULTANEOUSLY over the original snapshot:
    {a->b, b->c} moves a's values to b and b's ORIGINAL values to c (a
    sequential chain would pipe a through b into c and lose b's column);
    {a->b, b->a} is a clean swap; two olds to one new is rejected."""
    import pytest as _pytest

    from biocache_store_spark.operators.maintenance import rename_columns

    table = spark.createDataFrame(
        [("A1", "B1"), ("A2", "B2")], "a string, b string"
    )
    chained = rename_columns(table, {"a": "b", "b": "c"})
    assert set(chained.columns) == {"b", "c"}
    got = sorted((r["b"], r["c"]) for r in chained.collect())
    assert got == [("A1", "B1"), ("A2", "B2")]

    swapped = rename_columns(table, {"a": "b", "b": "a"})
    assert set(swapped.columns) == {"a", "b"}
    got2 = sorted((r["a"], r["b"]) for r in swapped.collect())
    assert got2 == [("B1", "A1"), ("B2", "A2")]

    with _pytest.raises(ValueError, match="ambiguous"):
        rename_columns(table, {"a": "c", "b": "c"})


def test_cleanup_columns_protects_bookkeeping(spark):
    """Keep-mode must never null the store's lifecycle columns: the
    reference only strips FullRecord raw properties
    (ResourceCleanupTask.scala:140 hasNestedProperty guard), so deleted /
    lastModifiedTime / processed are structurally immune there. Nulling
    lastModifiedTime here would make a later rows-cleanup delete the
    whole resource unconditionally (its no-lastModified branch)."""
    from biocache_store_spark.operators.maintenance import (
        cleanup_columns,
        cleanup_rows,
    )

    table = spark.createDataFrame(
        [("r1", "dr1", "cat1", "", "2024-06-01T00:00:00Z", "proc1")],
        "rowKey string, dataResourceUid string, catalogNumber string,"
        " deleted string, lastModifiedTime string, processed string",
    )
    out, report = cleanup_columns(table, "dr1", ["nothing_kept"], keep=True)
    row = out.collect()[0]
    assert row["catalogNumber"] is None  # raw column: cleared
    assert row["deleted"] == ""  # bookkeeping: untouched
    assert row["lastModifiedTime"] == "2024-06-01T00:00:00Z"
    assert row["processed"] == "proc1"
    assert {r["column"] for r in report.collect()} == {"catalogNumber"}
    # the poison sequence from the review: columns cleanup then rows
    # cleanup — the record was refreshed after last_load_date, so it
    # must survive, which requires lastModifiedTime to have survived
    rewritten, changes = cleanup_rows(out, "dr1", "2024-01-01T00:00:00Z")
    assert rewritten.collect()[0]["deleted"] == ""
    assert changes.count() == 0
    # delete-mode can't strip protected columns either, even if listed
    out2, _ = cleanup_columns(table, "dr1", ["deleted", "catalogNumber"], keep=False)
    row2 = out2.collect()[0]
    assert row2["deleted"] == "" and row2["catalogNumber"] is None


def test_remove_deleted_records_double_condition(spark):
    from biocache_store_spark.operators.maintenance import remove_deleted_records

    table = spark.createDataFrame(
        [
            ("r1", "dr1", "2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z"),  # goes
            ("r2", "dr1", "2024-06-01T00:00:00Z", "2024-02-01T00:00:00Z"),  # fresh
            ("r3", "dr1", "2024-01-01T00:00:00Z", ""),                      # live
            ("r4", "dr2", "2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z"),  # other dr
        ],
        "rowKey string, dataResourceUid string, lastModifiedTime string, deleted string",
    )
    remaining, dellog = remove_deleted_records(table, "dr1", "2024-05-01T00:00:00Z")
    assert {r["rowKey"] for r in remaining.collect()} == {"r2", "r3", "r4"}
    assert [r["deleted_key"] for r in dellog.collect()] == ["r1"]


def test_remap_unique_keys_strip_spaces_and_empty_skip(spark):
    from biocache_store_spark.operators.maintenance import remap_unique_keys

    records = spark.createDataFrame(
        [
            ("k1", "dr1", "AB 12", "Museum X"),
            ("k2", "dr1", None, ""),      # all terms empty -> skipped
            ("k3", "dr2", "CD34", "Y"),   # resource not selected
        ],
        "rowKey string, dataResourceUid string, catalogNumber string,"
        " institutionCode string",
    )
    out = remap_unique_keys(
        records, ["dr1"], ["catalogNumber", "institutionCode"]
    )
    rows = out.collect()
    # whitespace stripped everywhere, reference createUniqueID stripSpaces=true
    assert [(r["uniqueID"], r["rowKey"]) for r in rows] == [
        ("dr1|AB12|MuseumX", "k1")
    ]
    # a missing field column reads as empty, not an analysis error
    out2 = remap_unique_keys(records, ["dr1"], ["occurrenceID", "catalogNumber"])
    assert [r["uniqueID"] for r in out2.collect()] == ["dr1||AB12"]
