"""ANN quality measurement: recall@10 vs brute-force cosine.

The IVF/PQ paths are hash-exact (their *outputs* are pinned by oracle
queries) but approximate-by-design vs the true neighbor set — the first
question a real 100-TB similarity deployment asks is "what recall am I
buying at which nprobe/codebook size". This tool measures it on
synthetic clustered vectors:

  * corpus: `n` unit vectors in `dim` dims drawn around `n_clusters`
    Gaussian cluster centers (the realistic regime for embedding
    corpora — IVF on uniform noise is uninformative);
  * ground truth: exact cosine top-k per query, computed in NumPy on
    the driver (it is the oracle, not the system under test);
  * `ivf_topk` recall@k across an nprobe sweep, with kmeans_train
    centroids (the engine's own deterministic trainer);
  * `pq_topk` recall@k (asymmetric-distance re-rank over 8 subspaces,
    codebook = the same trained centroids) — on unit vectors L2 and
    cosine rank identically, so the cosine ground truth applies.

Usage: python tools/bench_ann_recall.py [n] [n_queries]
Defaults: 200_000 vectors (the 1M point in SCALE.md was run with
n=1_000_000), 50 queries (PQ scores min(n_queries, 20) — one driver
job per query). Prints per-config recall rows + one JSON line.
Results are recorded in SCALE.md ("ANN recall" section).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_corpus(n: int, dim: int, n_clusters: int, noise: float, seed: int):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n)
    V = centers[assign] + noise * rng.standard_normal((n, dim))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return V.astype(np.float64)


def ground_truth_topk(V: np.ndarray, q_ids: np.ndarray, k: int):
    """Exact cosine top-k per query (self excluded), NumPy on the driver."""
    gt = {}
    for qid in q_ids:
        sims = V @ V[qid]
        sims[qid] = -np.inf
        top = np.argpartition(-sims, k)[:k]
        # tie-break identically to the engine: sim desc, then id asc
        gt[int(qid)] = set(
            int(i) for i in sorted(top, key=lambda i: (-sims[i], i))[:k]
        )
    return gt


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    dim, n_clusters, noise, k = 64, 256, 0.15, 10
    kmeans_k, kmeans_iters = 256, 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import (
        ivf_assign_bulk,
        ivf_topk,
        kmeans_train,
        pq_encode,
        pq_topk,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        # local-mode driver hosts every task: the 1M-vector corpus plus
        # the cached assignment need real heap (default 1g OOMs)
        .config("spark.driver.memory", os.environ.get("ANN_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )

    t0 = time.time()
    V = make_corpus(n, dim, n_clusters, noise, seed=7)
    q_ids = np.linspace(0, n - 1, n_queries, dtype=np.int64)
    gt = ground_truth_topk(V, q_ids, k)
    print(f"corpus {n}x{dim}, gt for {n_queries} queries: "
          f"{time.time() - t0:.0f}s", flush=True)

    # ship the corpus through parquet so Spark gets real partitions
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    tmp = tempfile.mkdtemp(prefix="ann_recall_")
    path = os.path.join(tmp, "vectors.parquet")
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(V.ravel(), type=pa.float64()), dim
            ).cast(pa.list_(pa.float64())),
        }
    )
    pq_mod.write_table(table, path, row_group_size=50_000)
    vectors = spark.read.parquet(path)
    queries_df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in q_ids],
        "query_id long, embedding array<double>",
    )

    t0 = time.time()
    cells, centroids, _assigned = kmeans_train(
        vectors, k=kmeans_k, iters=kmeans_iters
    )
    cent_df = spark.createDataFrame(
        [(j, centroids[j]) for j in range(len(centroids))],
        "cell_id long, centroid array<double>",
    ).cache()
    cent_df.count()
    print(f"kmeans k={kmeans_k} iters={kmeans_iters} "
          f"({len(centroids)} surviving cells): {time.time() - t0:.0f}s",
          flush=True)

    # assign ONCE (matrix-form bulk pass, bit-identical to ivf_assign)
    # and reuse across the nprobe sweep — the index-built-once shape
    t0 = time.time()
    assigned = ivf_assign_bulk(vectors, cent_df).cache()
    assigned.count()
    print(f"ivf assignment (bulk, cached): {time.time() - t0:.0f}s",
          flush=True)

    results: dict[str, float] = {}
    for nprobe in (1, 2, 4, 8, 16):
        t0 = time.time()
        out = ivf_topk(
            vectors, queries_df, cent_df, k=k, nprobe=nprobe,
            assigned=assigned,
        ).collect()
        got: dict[int, set[int]] = {}
        for r in out:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec = float(
            np.mean([len(got.get(q, set()) & gt[q]) / k for q in gt])
        )
        results[f"ivf_nprobe_{nprobe}"] = round(rec, 4)
        print(f"ivf nprobe={nprobe:>2}: recall@{k} = {rec:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # PQ: codebook = trained centroids (full-dim rows; per-subspace
    # slices form the subspace codebooks, pq_encode's convention)
    book_df = cent_df.select(
        F.col("cell_id").alias("j"), F.col("centroid").alias("embedding")
    )
    encoded = pq_encode(vectors, book_df, n_subspaces=8).select(
        "vec_id", "codes"
    ).cache()
    encoded.count()
    pq_queries = [int(q) for q in q_ids[: min(n_queries, 20)]]
    t0 = time.time()
    hits = []
    hits_rerank = []
    shortlist = 100  # the production recipe: PQ shortlist -> exact re-rank
    book_rows = [centroids[j] for j in range(len(centroids))]
    for qid in pq_queries:
        out = pq_topk(
            encoded.filter(F.col("vec_id") != qid),
            [float(x) for x in V[qid]],
            book_rows,
            k=shortlist,
            n_subspaces=8,
        ).collect()
        ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
        hits.append(len(set(ranked[:k]) & gt[qid]) / k)
        # exact-cosine re-rank of the PQ shortlist (what a deployment
        # does: ADC prunes 1M -> 100, exact scoring ranks the 100)
        cand = np.asarray(ranked, dtype=np.int64)
        sims = V[cand] @ V[qid]
        order = cand[np.lexsort((cand, -sims))][:k]
        hits_rerank.append(len(set(int(i) for i in order) & gt[qid]) / k)
    results["pq_8x%d" % len(book_rows)] = round(float(np.mean(hits)), 4)
    results["pq_8x%d_rerank%d" % (len(book_rows), shortlist)] = round(
        float(np.mean(hits_rerank)), 4
    )
    print(f"pq 8 subspaces x {len(book_rows)} codewords: recall@{k} = "
          f"{np.mean(hits):.4f} raw, {np.mean(hits_rerank):.4f} with "
          f"exact re-rank of the ADC top-{shortlist}, over "
          f"{len(pq_queries)} queries ({time.time() - t0:.0f}s)", flush=True)

    # IVFADC: product-quantize the RESIDUAL v - centroid[cell] with a
    # codebook trained on the residuals themselves (second kmeans pass),
    # then probe + cell-dispatched ADC (ivfpq_topk). This is the 100-TB
    # production shape — it breaks standalone PQ's same-code tie
    # degeneracy at density.
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk,
        pq_encode_residual,
    )

    t0 = time.time()
    cell_of = {
        r["vec_id"]: r["cell_id"]
        for r in assigned.select("vec_id", "cell_id").collect()
    }
    C = np.asarray(centroids, dtype=np.float64)
    # cent_df's cell_id IS the position into `centroids` (built with
    # enumerate above), so assigned ids index C directly — mapping
    # through kmeans seed ids would mis-subtract whenever a seed cell
    # was dropped
    cells_arr = np.asarray(
        [cell_of[i] for i in range(n)], dtype=np.int64
    )
    Rm = V - C[cells_arr]
    rpath = os.path.join(tmp, "residuals.parquet")
    rtable = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(Rm.ravel(), type=pa.float64()), dim
            ).cast(pa.list_(pa.float64())),
        }
    )
    pq_mod.write_table(rtable, rpath, row_group_size=50_000)
    _rc, rbook, _ra = kmeans_train(
        spark.read.parquet(rpath), k=kmeans_k, iters=kmeans_iters
    )
    print(f"residual codebook kmeans: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    rbook_df = spark.createDataFrame(
        [(j, rbook[j]) for j in range(len(rbook))],
        "j long, embedding array<double>",
    )
    enc_r = pq_encode_residual(vectors, cent_df.select(
        "cell_id", "centroid"
    ), rbook_df, n_subspaces=8).select("vec_id", "cell_id", "codes").cache()
    enc_r.count()
    print(f"ivfadc encode: {time.time() - t0:.0f}s", flush=True)

    cent_rows = [
        (r["cell_id"], r["centroid"])
        for r in sorted(cent_df.collect(), key=lambda r: r["cell_id"])
    ]
    t0 = time.time()
    hits_adc = []
    hits_adc_rr = []
    for qid in pq_queries:
        out = ivfpq_topk(
            enc_r.filter(F.col("vec_id") != qid),
            [float(x) for x in V[qid]],
            cent_rows,
            rbook,
            k=shortlist,
            nprobe=4,
            n_subspaces=8,
        ).collect()
        ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
        hits_adc.append(len(set(ranked[:k]) & gt[qid]) / k)
        cand = np.asarray(ranked, dtype=np.int64)
        sims = V[cand] @ V[qid]
        order = cand[np.lexsort((cand, -sims))][:k]
        hits_adc_rr.append(len(set(int(i) for i in order) & gt[qid]) / k)
    results["ivfadc_nprobe4_8x%d" % len(rbook)] = round(
        float(np.mean(hits_adc)), 4
    )
    results["ivfadc_nprobe4_8x%d_rerank%d" % (len(rbook), shortlist)] = round(
        float(np.mean(hits_adc_rr)), 4
    )
    print(f"ivfadc nprobe=4, 8 subspaces x {len(rbook)} residual codewords: "
          f"recall@{k} = {np.mean(hits_adc):.4f} raw, "
          f"{np.mean(hits_adc_rr):.4f} with exact re-rank of the ADC "
          f"top-{shortlist}, over {len(pq_queries)} queries "
          f"({time.time() - t0:.0f}s)", flush=True)

    # per-subspace residual codebooks — the REAL product quantizer
    # (Jegou et al. train each subspace independently; the shared
    # full-dim codebook above correlates slices and wastes most of the
    # 256^8 product space). Stitch subspace-s centroid j into codeword
    # j's slice s, which is exactly pq convention's full-dim-row shape.
    t0 = time.time()
    from biocache_store_spark.operators.similarity import train_pq_codebook

    rbook_ps = train_pq_codebook(
        spark.read.parquet(rpath), n_subspaces=8, k=kmeans_k,
        iters=kmeans_iters, dim=dim,
    )
    Kp = len(rbook_ps)
    print(f"per-subspace residual codebooks (K={Kp}): "
          f"{time.time() - t0:.0f}s", flush=True)

    rbook_ps_df = spark.createDataFrame(
        [(j, rbook_ps[j]) for j in range(Kp)],
        "j long, embedding array<double>",
    )
    enc_ps = pq_encode_residual(vectors, cent_df.select(
        "cell_id", "centroid"
    ), rbook_ps_df, n_subspaces=8).select("vec_id", "cell_id", "codes").cache()
    enc_ps.count()
    t0 = time.time()
    hits_ps = []
    hits_ps_rr = []
    for qid in pq_queries:
        out = ivfpq_topk(
            enc_ps.filter(F.col("vec_id") != qid),
            [float(x) for x in V[qid]],
            cent_rows,
            rbook_ps,
            k=shortlist,
            nprobe=4,
            n_subspaces=8,
        ).collect()
        ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
        hits_ps.append(len(set(ranked[:k]) & gt[qid]) / k)
        cand = np.asarray(ranked, dtype=np.int64)
        sims = V[cand] @ V[qid]
        order = cand[np.lexsort((cand, -sims))][:k]
        hits_ps_rr.append(len(set(int(i) for i in order) & gt[qid]) / k)
    results["ivfadc_ps_nprobe4_8x%d" % Kp] = round(float(np.mean(hits_ps)), 4)
    results["ivfadc_ps_nprobe4_8x%d_rerank%d" % (Kp, shortlist)] = round(
        float(np.mean(hits_ps_rr)), 4
    )
    print(f"ivfadc per-subspace nprobe=4, 8 x {Kp} codewords: recall@{k} = "
          f"{np.mean(hits_ps):.4f} raw, {np.mean(hits_ps_rr):.4f} with "
          f"exact re-rank of the ADC top-{shortlist} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # --- quality-lever sweep (VERDICT r11 #3): shortlist x nprobe on the
    # per-subspace IVFADC config, BATCH form (one job per nprobe for all
    # queries, k = the largest shortlist; smaller shortlists are prefixes
    # of the same ADC ranking, so each job yields the whole row).
    from biocache_store_spark.operators.similarity import (
        ivfpq_topk_batch,
        ivfpq_topk_batch_rerank,
    )

    sweep_queries_df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in pq_queries],
        "query_id long, embedding array<double>",
    )
    shortlists = (100, 400, 1000)
    for nprobe in (4, 8, 16):
        t0 = time.time()
        out = ivfpq_topk_batch(
            enc_ps, sweep_queries_df, cent_rows, rbook_ps,
            k=max(shortlists), nprobe=nprobe, n_subspaces=8,
        ).collect()
        ranked_by_q: dict[int, list[int]] = {}
        for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
            ranked_by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        dt = time.time() - t0
        for sl in shortlists:
            hits_sl = []
            for qid in pq_queries:
                cand = np.asarray(ranked_by_q.get(qid, [])[:sl], dtype=np.int64)
                if len(cand) == 0:
                    hits_sl.append(0.0)
                    continue
                sims = V[cand] @ V[qid]
                order = cand[np.lexsort((cand, -sims))][:k]
                hits_sl.append(len(set(int(i) for i in order) & gt[qid]) / k)
            key = "ivfadc_ps_nprobe%d_rerank%d" % (nprobe, sl)
            results[key] = round(float(np.mean(hits_sl)), 4)
            print(f"sweep nprobe={nprobe:>2} shortlist={sl:>4}: "
                  f"recall@{k} = {results[key]:.4f} "
                  f"(batch job {dt:.0f}s)", flush=True)

    # --- the same recipe through the ENGINE surface (ivfpq_topk_batch_rerank
    # — the operator a deployment calls), one job: must reproduce the
    # numpy-prefix re-rank for its config exactly.
    eng_nprobe, eng_sl = 8, 400
    t0 = time.time()
    eng = ivfpq_topk_batch_rerank(
        enc_ps, vectors, sweep_queries_df, cent_rows, rbook_ps,
        k=k, shortlist=eng_sl, nprobe=eng_nprobe, n_subspaces=8,
    ).collect()
    eng_by_q: dict[int, set[int]] = {}
    for r in eng:
        eng_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    eng_rec = float(np.mean(
        [len(eng_by_q.get(qid, set()) & gt[qid]) / k for qid in pq_queries]
    ))
    results["engine_rerank_nprobe%d_sl%d" % (eng_nprobe, eng_sl)] = round(
        eng_rec, 4
    )
    ref = results.get("ivfadc_ps_nprobe%d_rerank%d" % (eng_nprobe, eng_sl))
    print(f"ENGINE ivfpq_topk_batch_rerank nprobe={eng_nprobe} "
          f"shortlist={eng_sl}: recall@{k} = {eng_rec:.4f} "
          f"(numpy replay: {ref}) in {time.time() - t0:.0f}s "
          f"for {len(pq_queries)} queries", flush=True)

    print(json.dumps({
        "metric": "ann_recall_at_10", "n": n, "dim": dim,
        "n_clusters": n_clusters, "noise": noise,
        "n_queries": n_queries, "recall": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
