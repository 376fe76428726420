"""Scale measurement: exact repeated-substring spans / decontamination.

The round-9 fixture (SCALE.md): 300-char documents, a 120-char
boilerplate embedded in every 8th doc, N docs. Round 10 adds the
anchor_hex_zeros knob sweep — z=1 (default, 1/16 anchor density) vs
z=0 (EXACT mode: every position anchored, the Lee-et-al no-miss
guarantee) — so the exact-mode cost is a recorded number, not a guess.

Usage: python tools/bench_substring.py [--passes N] [n_docs ...]
       (defaults: 1 pass, 1M docs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def docs(spark, n: int):
    """N pseudo-random 300-char docs; every 8th doc carries the same
    120-char boilerplate at offset 60."""
    filler = F.sha2(F.concat(F.lit("doc"), F.col("id").cast("string")), 512)
    body = F.concat(filler, filler, filler)  # 384 hex chars
    boiler = "B" * 120
    text = F.when(
        F.col("id") % 8 == 0,
        F.concat(
            F.substring(body, 1, 60), F.lit(boiler), F.substring(body, 61, 120)
        ),
    ).otherwise(F.substring(body, 1, 300))
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def main() -> int:
    from biocache_store_spark.operators.curation import (
        repeated_substring_spans,
        substring_decontaminate,
    )

    args = sys.argv[1:]
    passes = 1
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--passes":
            passes = int(args.pop(0))
        else:
            raise SystemExit(f"unknown flag {flag}")
    sizes = [int(float(a)) for a in args] or [1_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for n in sizes:
        d = docs(spark, n).repartition(64).persist()
        d.count()
        ev = docs(spark, 200).withColumn(
            "text", F.concat(F.lit("Q: "), F.lit("B" * 120), F.lit(" [end]"))
        )
        for z in (1, 0):
            for label, run in (
                (
                    f"self-dedup z={z}",
                    lambda z=z: repeated_substring_spans(
                        d, min_len=40, anchor_hex_zeros=z
                    ),
                ),
                (
                    f"decontaminate z={z}",
                    lambda z=z: substring_decontaminate(
                        d, ev, min_len=40, anchor_hex_zeros=z
                    ),
                ),
            ):
                times, cnt = [], None
                for _ in range(passes):
                    t0 = time.time()
                    cnt = run().count()
                    times.append(time.time() - t0)
                print(
                    f"n={n} {label}: min {min(times):.1f} s "
                    f"(passes {[round(t, 1) for t in times]}, spans {cnt})",
                    flush=True,
                )
        d.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
