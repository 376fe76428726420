"""A/B bench: JVM-join vs live-Python duplicate-detection kernel.

Round-9 measurement for SCALE.md (VERDICT r8 task #6): the grouped
pairwise matcher (find_group_duplicates) was the last per-row Python
kernel on the occurrence hot path — every within-group pair paid a
Python spatial-ladder walk plus an interpreted Levenshtein.
detect_duplicates_join moves the pairwise predicate into whole-stage
codegen (within-group self-join, unrolled ladder whens, builtin
levenshtein) and leaves Python a linear prep pass plus the greedy claim
walk over match-sized edges. Both kernels are row-identical
(tests/test_operators_offline.py::test_detect_duplicates_join_parity);
this script measures end-to-end wall clock at N occurrence rows and
cross-checks the status histograms.

Usage: python tools/bench_dedup.py [--kernels a,b] [--passes N] [n_rows ...]
       (defaults: all three kernels, 2 passes, 2M 20M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def occurrences(spark, n: int):
    """N synthetic occurrence rows in (taxon, day) groups of ~16 with a
    REALISTIC duplicate mix: ~25% of records sit on their taxon's base
    location (reported at several precisions -> spatial-ladder matches,
    collectors drawn from a small pool with a fuzzy typo / unknown /
    null spread), the other ~75% are singletons — a unique jittered
    point and a mostly-distinct collector — so most within-group pairs
    MISS, which is the regime that actually stresses the pairwise
    kernel (claims prune the live kernel's scan; misses do not)."""
    taxa = max(1, n // 16)
    tx = F.col("id") % taxa
    base_lat = F.lit(-35.0) - (tx % 1000).cast("double") * 0.003
    base_lon = F.lit(144.0) + (tx % 1000).cast("double") * 0.003
    v = F.col("id") % 16
    jitter = (F.col("id") % 7919).cast("double") * 0.0013 + 0.01
    lat = (
        F.when(v == 0, F.format_string("%.5f", base_lat))
        .when(v == 1, F.format_string("%.1f", base_lat))
        .when(v == 2, F.format_string("%.5f", base_lat))
        .when(v == 3, F.format_string("%.2f", base_lat))
        .otherwise(F.format_string("%.5f", base_lat + jitter))
    )
    lon = (
        F.when(v == 0, F.format_string("%.5f", base_lon))
        .when(v == 1, F.format_string("%.1f", base_lon))
        .when(v == 2, F.format_string("%.5f", base_lon))
        .when(v == 3, F.format_string("%.2f", base_lon))
        .otherwise(F.format_string("%.5f", base_lon + jitter))
    )
    pool = F.element_at(
        F.array(
            F.lit("Smith, J."), F.lit("Smyth, J."), F.lit("Smith J"),
            F.lit("UNKNOWN OR ANONYMOUS"), F.lit(None).cast("string"),
        ),
        (F.col("id") % 5 + 1).cast("int"),
    )
    coll = F.when(v <= 3, pool).otherwise(
        F.concat(F.lit("Collector "), F.col("id") % 997)
    )
    return spark.range(n).select(
        F.concat(F.lit("o"), F.col("id")).alias("occurrenceID"),
        F.concat(F.lit("dr"), (F.col("id") % 3)).alias("dataResourceUid"),
        F.concat(F.lit("lsid:"), tx).alias("taxonConceptID"),
        F.lit("2000").alias("year"),
        F.lit("01").alias("month"),
        F.lit("05").alias("day"),
        lat.alias("decimalLatitude"),
        lon.alias("decimalLongitude"),
        coll.alias("recordedBy"),
        F.when(
            F.col("id") % 11 == 0,
            F.concat(F.lit("RN"), F.col("id") % 5),
        ).alias("recordNumber"),
        F.when(F.col("id") % 13 == 0, F.lit("CAT42")).alias("catalogNumber"),
    )


def main() -> int:
    from biocache_store_spark.operators.dedup import (
        detect_duplicates_grouped,
        detect_duplicates_join,
        detect_duplicates_streamed,
    )

    args = sys.argv[1:]
    kernels = None
    passes = 2
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--kernels":
            kernels = args.pop(0).split(",")
        elif flag == "--passes":
            passes = int(args.pop(0))
        else:
            raise SystemExit(f"unknown flag {flag}")
    sizes = [int(float(a)) for a in args] or [2_000_000, 20_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for n in sizes:
        df = occurrences(spark, n).repartition(64).persist()
        df.count()
        hists = {}
        import functools

        for label, fn in (
            ("streamed-np", detect_duplicates_streamed),
            (
                "streamed-scalar",
                functools.partial(detect_duplicates_streamed, vectorized=False),
            ),
            ("jvm-join", detect_duplicates_join),
            ("python-grouped", detect_duplicates_grouped),
        ):
            if kernels is not None and label not in kernels:
                continue
            times = []
            for rep in range(passes):
                t0 = time.time()
                hist = {
                    r["status"]: r["count"]
                    for r in fn(df).groupBy("status").count().collect()
                }
                times.append(time.time() - t0)
            hists[label] = hist
            print(
                f"n={n} {label}: min {min(times):.1f} s (passes "
                f"{[round(t, 1) for t in times]}, statuses {sorted(hist.items())})",
                flush=True,
            )
        assert len(set(map(str, (sorted(h.items()) for h in hists.values())))) == 1, hists
        df.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
