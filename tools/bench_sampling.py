"""A/B bench: vectorized vs scalar point-in-polygon sampling kernel.

Round-9 measurement for SCALE.md (VERDICT r8 "What's wrong #2"): the
contextual-layer sampling kernel was the last scalar-Python hot loop on
the spatial path — each distinct point × each polygon layer called a
pure-Python ray cast. The shipped kernel ray-casts each layer over the
whole Arrow batch with NumPy (points_in_polygon_np, bit-identical by
test); this script measures both forms end-to-end through
sample_cl_layers' mapInPandas at N distinct points × 10 layers.

Usage: python tools/bench_sampling.py [n_points ...]  (default 2M 20M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def layers_df(spark):
    """10 layers over Australia-ish extents: 6 rectangles + 4 octagons
    (average ring ~7 vertices, like state/IBRA-style contextual WKTs)."""
    import math

    rows = []
    for i in range(6):
        x0, y0 = 112 + 6 * i, -44 + 3 * i
        rows.append(
            (
                f"cl{i}",
                f"rect{i}",
                f"POLYGON(({x0} {y0}, {x0 + 12} {y0}, {x0 + 12} {y0 + 14},"
                f" {x0} {y0 + 14}, {x0} {y0}))",
            )
        )
    for i in range(4):
        cx, cy, r = 120 + 8 * i, -30 + 2 * i, 6 + i
        pts = ", ".join(
            f"{cx + r * math.cos(a):.4f} {cy + r * math.sin(a):.4f}"
            for a in [k * math.pi / 4 for k in range(8)]
        )
        first = pts.split(",")[0].strip()
        rows.append((f"cl{6 + i}", f"oct{i}", f"POLYGON(({pts}, {first}))"))
    return spark.createDataFrame(rows, "layerID string, name string, wkt string")


def scalar_sample(points, cl_layers):
    """The round-8 kernel (per-point Python ray cast) reconstructed for
    the A/B — same plan shape, scalar inner loop."""
    from pyspark.sql import types as T

    from biocache_store_spark.operators.sampling import (
        parse_wkt_polygon,
        point_in_polygon,
    )
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(points.sparkSession)
    points = ensure_min_parallelism(points)
    layers = [
        (r["layerID"], r["name"], parse_wkt_polygon(r["wkt"]))
        for r in cl_layers.select("layerID", "name", "wkt").collect()
    ]
    bc = points.sparkSession.sparkContext.broadcast(layers)
    schema = T.StructType(
        list(points.schema.fields)
        + [T.StructField("cl", T.MapType(T.StringType(), T.StringType()))]
    )

    def run(batches):
        local_layers = bc.value
        for pdf in batches:
            cl_col = []
            for lat, lon in zip(pdf["lat"], pdf["lon"]):
                hits = {
                    layer_id: name
                    for layer_id, name, ring in local_layers
                    if point_in_polygon(float(lon), float(lat), ring)
                }
                cl_col.append(hits)
            out = pdf.copy()
            out["cl"] = cl_col
            yield out

    return points.mapInPandas(run, schema=schema)


def main() -> int:
    from biocache_store_spark.operators.sampling import sample_cl_layers

    sizes = [int(float(a)) for a in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cl = layers_df(spark)
    for n in sizes:
        pts = (
            spark.range(n)
            .select(
                (F.lit(-45.0) + (F.col("id") % 35001) / 1000.0).alias("lat"),
                (F.lit(110.0) + (F.col("id") % 45007) / 1000.0).alias("lon"),
            )
            .repartition(64)
            .persist()
        )
        pts.count()
        for label, fn in (("vectorized", sample_cl_layers), ("scalar", scalar_sample)):
            times = []
            for rep in range(2):
                t0 = time.time()
                out = fn(pts, cl).select(F.sum(F.size("cl")).alias("s")).collect()
                times.append(time.time() - t0)
            print(
                f"n={n} {label}: min {min(times):.1f} s (passes "
                f"{[round(t, 1) for t in times]}, sum hits {out[0]['s']})",
                flush=True,
            )
        pts.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
