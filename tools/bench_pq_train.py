"""Codebook-trainer timing: single-pass vs sequential (VERDICT r11 #5).

train_pq_codebook's two forms must produce bit-identical codebooks; the
single-pass form exists to cut vector-relation scans from
m x (iters + 1) (m sequential kmeans_train calls, each with a final
assignment the codebook path discards) to `iters`. This measures both
at 1M vectors and asserts the parity at full scale.

Usage: python tools/bench_pq_train.py [n] [k] [iters]
Defaults: 1_000_000, 256, 2. Results recorded in SCALE.md (round 12).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench_ann_recall import make_corpus  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    dim, n_subspaces = 64, 8

    from pyspark.sql import SparkSession

    from biocache_store_spark.operators.similarity import train_pq_codebook

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("ANN_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )

    V = make_corpus(n, dim, 256, 0.15, seed=7)
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    tmp = tempfile.mkdtemp(prefix="pq_train_")
    path = os.path.join(tmp, "vectors.parquet")
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
        row_group_size=50_000,
    )
    vectors = spark.read.parquet(path)

    t0 = time.time()
    one = train_pq_codebook(
        vectors, n_subspaces=n_subspaces, k=k, iters=iters, single_pass=True
    )
    t_one = time.time() - t0
    print(f"single-pass: {t_one:.0f}s", flush=True)

    t0 = time.time()
    seq = train_pq_codebook(
        vectors, n_subspaces=n_subspaces, k=k, iters=iters, single_pass=False
    )
    t_seq = time.time() - t0
    print(f"sequential:  {t_seq:.0f}s", flush=True)

    assert one == seq, "trainer parity broken at scale"
    print(json.dumps({
        "metric": "pq_codebook_train_sec", "n": n, "k": k, "iters": iters,
        "n_subspaces": n_subspaces,
        "single_pass_sec": round(t_one, 1),
        "sequential_sec": round(t_seq, 1),
        "speedup": round(t_seq / t_one, 2),
        "parity": one == seq,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
