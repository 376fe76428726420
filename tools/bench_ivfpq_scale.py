"""10M-vector IVFADC point (VERDICT r11 stretch): extend the ANN scale
ladder one decade past the 1M recall table.

Measures the full production lifecycle at n vectors:
  * coarse quantizer trained on a 10% SAMPLE (the standard large-corpus
    recipe — kmeans cost is sample-sized while assignment stays exact),
    cell count grown with the corpus (n/10k cells, cluster count grown
    to match in the synthetic corpus);
  * index build via write_ivfpq_index(store_vectors=True): residual
    write pass, single-pass per-subspace codebook training, fused
    encode pass + cell-partitioned codes/ write, assignment pass +
    vectors/ write;
  * 50-query batch ADC and batch exact-re-rank (shortlist=400) against
    the persisted index (query_ivfpq_index_batch), with recall@10 vs
    exact-cosine ground truth.

Usage: python tools/bench_ivfpq_scale.py [n] [n_queries] [m] [nprobe] [shortlist]
Defaults: 10_000_000, 50, 8, 4, 400. Driver memory via ANN_DRIVER_MEM
(default 48g — the corpus, its arrow staging and local-mode tasks share
one JVM+python). Results recorded in SCALE.md (round 12): the m=8
lifecycle row, and the m=16/nprobe=16/shortlist=1000 configuration the
density rule calls for.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench_ann_recall import ground_truth_topk, make_corpus  # noqa: E402


def du_gb(path: str) -> float:
    out = subprocess.run(
        ["du", "-sb", path], capture_output=True, text=True, check=True
    ).stdout
    return round(int(out.split()[0]) / 2**30, 2)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_subspaces = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    shortlist = int(sys.argv[5]) if len(sys.argv) > 5 else 400
    dim, noise, k = 64, 0.15, 10
    n_clusters = max(256, n // 10_000)   # cluster structure grows with n
    k_cells = n_clusters                 # cells track the cluster count

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from biocache_store_spark.operators.similarity import (
        ivf_assign_bulk,
        kmeans_train,
        query_ivfpq_index_batch,
        train_pq_codebook,
        write_ivfpq_index,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("ANN_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
    )

    timings: dict[str, float] = {}
    t0 = time.time()
    V = make_corpus(n, dim, n_clusters, noise, seed=7)
    q_ids = np.linspace(0, n - 1, n_queries, dtype=np.int64)
    gt = ground_truth_topk(V, q_ids, k)
    timings["corpus_and_ground_truth"] = round(time.time() - t0, 1)
    print(f"corpus {n}x{dim} ({n_clusters} clusters), gt for "
          f"{n_queries} queries: {timings['corpus_and_ground_truth']}s",
          flush=True)

    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    tmp = tempfile.mkdtemp(prefix="ivfpq_scale_")
    path = os.path.join(tmp, "vectors.parquet")
    t0 = time.time()
    pq_mod.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.ravel(), type=pa.float64()), dim
                ).cast(pa.list_(pa.float64())),
            }
        ),
        path,
        row_group_size=100_000,
    )
    timings["corpus_parquet_write"] = round(time.time() - t0, 1)
    vectors = spark.read.parquet(path)
    queries_df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in q_ids],
        "query_id long, embedding array<double>",
    )

    # --- index build ------------------------------------------------
    build_t0 = time.time()
    t0 = time.time()
    sample = vectors.filter(F.col("vec_id") % 10 == 0)
    _c, cents, _a = kmeans_train(sample, k=k_cells, iters=1)
    cent_df = spark.createDataFrame(
        [(j, cents[j]) for j in range(len(cents))],
        "cell_id long, centroid array<double>",
    ).cache()
    cent_df.count()
    timings["coarse_kmeans_on_sample"] = round(time.time() - t0, 1)
    print(f"coarse kmeans k={k_cells} on 10% sample "
          f"({len(cents)} cells): {timings['coarse_kmeans_on_sample']}s",
          flush=True)

    t0 = time.time()
    rpath = os.path.join(tmp, "residuals")
    (
        ivf_assign_bulk(vectors, cent_df)
        .join(F.broadcast(cent_df.select("cell_id", "centroid")), "cell_id")
        .select(
            "vec_id",
            F.zip_with(
                F.col("embedding"), F.col("centroid"), lambda a, b: a - b
            ).alias("embedding"),
        )
        .write.parquet(rpath)
    )
    timings["residual_pass"] = round(time.time() - t0, 1)
    print(f"residual write pass: {timings['residual_pass']}s", flush=True)

    t0 = time.time()
    book = train_pq_codebook(
        spark.read.parquet(rpath), n_subspaces=n_subspaces, k=256, iters=1,
    )
    timings["codebook_train_single_pass"] = round(time.time() - t0, 1)
    print(f"per-subspace codebook (single-pass, K={len(book)}): "
          f"{timings['codebook_train_single_pass']}s", flush=True)

    book_df = spark.createDataFrame(
        [(j, book[j]) for j in range(len(book))],
        "j long, embedding array<double>",
    )
    t0 = time.time()
    index = os.path.join(tmp, "index")
    write_ivfpq_index(
        vectors, cent_df, book_df, index, n_subspaces=n_subspaces,
        store_vectors=True,
    )
    timings["write_index_codes_and_vectors"] = round(time.time() - t0, 1)
    timings["index_build_total"] = round(time.time() - build_t0, 1)
    sizes = {
        "corpus_gb": du_gb(path),
        "codes_gb": du_gb(index + "/codes"),
        "vectors_store_gb": du_gb(index + "/vectors"),
    }
    print(f"index build total: {timings['index_build_total']}s; "
          f"sizes {sizes}", flush=True)

    # --- queries ----------------------------------------------------
    def recall(rows):
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return round(float(np.mean(
            [len(got.get(int(q), set()) & gt[int(q)]) / k for q in q_ids]
        )), 4)

    t0 = time.time()
    adc = query_ivfpq_index_batch(
        spark, index, queries_df, k=k, nprobe=nprobe,
        n_subspaces=n_subspaces,
    ).collect()
    timings["batch_adc_50q"] = round(time.time() - t0, 1)
    adc_recall = recall(adc)
    print(f"batch ADC ({n_queries}q, nprobe={nprobe}): "
          f"{timings['batch_adc_50q']}s, recall@{k}={adc_recall}",
          flush=True)

    t0 = time.time()
    rr = query_ivfpq_index_batch(
        spark, index, queries_df, k=k, nprobe=nprobe,
        n_subspaces=n_subspaces, rerank_shortlist=shortlist,
    ).collect()
    timings["batch_rerank_50q"] = round(time.time() - t0, 1)
    rr_recall = recall(rr)
    print(f"batch re-rank ({n_queries}q, nprobe={nprobe}, "
          f"shortlist={shortlist}): {timings['batch_rerank_50q']}s, "
          f"recall@{k}={rr_recall}", flush=True)

    print(json.dumps({
        "metric": "ivfpq_scale_point", "n": n, "dim": dim,
        "n_clusters": n_clusters, "k_cells": len(cents),
        "n_subspaces": n_subspaces,
        "nprobe": nprobe, "shortlist": shortlist,
        "n_queries": n_queries,
        "timings_sec": timings, "sizes": sizes,
        "recall_at_10": {"adc": adc_recall, "rerank": rr_recall},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
