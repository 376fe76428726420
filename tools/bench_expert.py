"""A/B bench: vectorized vs scalar expert-range distance kernel.

Round-9 measurement for SCALE.md: find_outliers' mapInPandas previously
called the pure-Python distance_outside_m per record (ray cast + a Python
loop over boundary segments). The shipped kernel (distances_outside_m_np)
evaluates whole Arrow batches per taxon with NumPy — bit-identical by
test — making the cost flat in ring size like the round-9 sampling fix.

Usage: python tools/bench_expert.py [n_rows ...]  (default 2M 20M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def ranges_df(spark, n_taxa: int = 50, verts: int = 8):
    """n_taxa expert ranges: `verts`-gon rings around spread centres."""
    import math

    rows = []
    for t in range(n_taxa):
        cx, cy, r = 115 + (t % 9) * 3, -40 + (t % 11) * 3, 4 + t % 3
        pts = ", ".join(
            f"{cx + r * math.cos(a):.4f} {cy + r * math.sin(a):.4f}"
            for a in [k * 2 * math.pi / verts for k in range(verts)]
        )
        first = pts.split(",")[0].strip()
        rows.append((f"taxon:{t}", f"POLYGON(({pts}, {first}))"))
    return spark.createDataFrame(rows, "taxonConceptID string, wkt string")


def scalar_find_outliers(records, distributions):
    """The pre-round-9 kernel (per-record Python distance) reconstructed
    for the A/B — same broadcast-dim plan, scalar inner loop."""
    import pandas as pd
    from pyspark.sql import types as T

    from biocache_store_spark.operators.outlier_distribution import (
        distance_outside_m,
    )
    from biocache_store_spark.operators.sampling import parse_wkt_polygon
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(records.sparkSession)
    records = ensure_min_parallelism(records)
    rings = {
        r["taxonConceptID"]: parse_wkt_polygon(r["wkt"])
        for r in distributions.select("taxonConceptID", "wkt").collect()
    }
    bc = records.sparkSession.sparkContext.broadcast(rings)
    taxon_keys = distributions.select(
        F.col("taxonConceptID").cast("string").alias("taxon")
    ).distinct()
    subset = (
        records.select(
            F.col("occurrenceID").cast("string").alias("occurrence_id"),
            F.col("taxonConceptID").cast("string").alias("taxon"),
            F.col("decimalLatitude").cast("double").alias("lat"),
            F.col("decimalLongitude").cast("double").alias("lon"),
        )
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .join(F.broadcast(taxon_keys), "taxon", "left_semi")
    )
    schema = T.StructType(
        [
            T.StructField("occurrence_id", T.StringType()),
            T.StructField("taxon", T.StringType()),
            T.StructField("in_range", T.BooleanType()),
            T.StructField("distance_outside_m", T.DoubleType()),
        ]
    )

    def run(batches):
        local = bc.value
        for pdf in batches:
            dist = [
                distance_outside_m(lon, lat, local[taxon])
                for taxon, lat, lon in zip(pdf["taxon"], pdf["lat"], pdf["lon"])
            ]
            yield pd.DataFrame(
                {
                    "occurrence_id": pdf["occurrence_id"],
                    "taxon": pdf["taxon"],
                    "in_range": [d == 0.0 for d in dist],
                    "distance_outside_m": [round(d, 1) for d in dist],
                }
            )

    return subset.mapInPandas(run, schema=schema)


def main() -> int:
    from biocache_store_spark.operators.outlier_distribution import find_outliers

    args = sys.argv[1:]
    verts = 8
    if args and args[0] == "--verts":
        args.pop(0)
        verts = int(args.pop(0))
    sizes = [int(float(a)) for a in args] or [2_000_000, 20_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    dists = ranges_df(spark, verts=verts)
    for n in sizes:
        recs = (
            spark.range(n)
            .select(
                F.concat(F.lit("o"), F.col("id")).alias("occurrenceID"),
                F.concat(F.lit("taxon:"), F.col("id") % 50).alias(
                    "taxonConceptID"
                ),
                (F.lit(-45.0) + (F.col("id") % 35001) / 1000.0).alias(
                    "decimalLatitude"
                ),
                (F.lit(110.0) + (F.col("id") % 45007) / 1000.0).alias(
                    "decimalLongitude"
                ),
            )
            .repartition(64)
            .persist()
        )
        recs.count()
        sums = {}
        for label, fn in (
            ("vectorized", find_outliers),
            ("scalar", scalar_find_outliers),
        ):
            times = []
            for rep in range(2):
                t0 = time.time()
                agg = (
                    fn(recs, dists)
                    .agg(
                        F.round(F.sum("distance_outside_m"), 0).alias("s"),
                        F.sum(F.col("in_range").cast("int")).alias("k"),
                    )
                    .collect()[0]
                )
                times.append(time.time() - t0)
            sums[label] = (agg["s"], agg["k"])
            print(
                f"n={n} verts={verts} {label}: min {min(times):.1f} s (passes "
                f"{[round(t, 1) for t in times]}, sum/inside {sums[label]})",
                flush=True,
            )
        assert sums["vectorized"] == sums["scalar"], sums
        recs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
