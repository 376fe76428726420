"""Expert-distribution outlier detection.

Port of tool/ExpertDistributionOutlierTool.scala:106-575: records of a taxon
are tested against the expert range polygon (WKT) for that taxon; records
outside the polygon are flagged SPECIES_OUTSIDE_EXPERT_RANGE with their
distance outside in metres (the reference asks the layers service for the
distance; here it is computed directly as the minimum great-circle-scaled
distance to the polygon boundary — equirectangular approximation, adequate
at outlier-flagging precision).

Spark shape: the distributions dim (taxon -> polygon) is broadcast; the test
runs in one Arrow-batched pass over records of matching taxa.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from biocache_store_spark.operators.sampling import parse_wkt_polygon, point_in_polygon

_M_PER_DEG_LAT = 110540.0
_M_PER_DEG_LON = 111320.0


def _point_segment_distance_m(
    lon: float, lat: float, a: tuple[float, float], b: tuple[float, float]
) -> float:
    """Distance from point to segment, metres (equirectangular)."""
    cos_lat = math.cos(math.radians(lat))

    def to_xy(p):
        return (p[0] * _M_PER_DEG_LON * cos_lat, p[1] * _M_PER_DEG_LAT)

    px, py = to_xy((lon, lat))
    ax, ay = to_xy(a)
    bx, by = to_xy(b)
    dx, dy = bx - ax, by - ay
    if dx == 0 and dy == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
    cx, cy = ax + t * dx, ay + t * dy
    return math.hypot(px - cx, py - cy)


def distance_outside_m(lon: float, lat: float, ring: list[tuple[float, float]]) -> float:
    """0.0 inside the polygon, else metres to the nearest boundary point.

    The ring is treated as implicitly closed (matching point_in_polygon):
    the segment from the last vertex back to the first is included even
    when the WKT does not repeat the first vertex, otherwise points near
    that edge measure to a farther one."""
    if point_in_polygon(lon, lat, ring):
        return 0.0
    if len(ring) < 2:
        raise ValueError("degenerate ring: need at least 2 vertices")
    segments = [(ring[i], ring[i + 1]) for i in range(len(ring) - 1)]
    if ring[0] != ring[-1]:
        segments.append((ring[-1], ring[0]))
    return min(
        _point_segment_distance_m(lon, lat, a, b) for a, b in segments
    )


def find_outliers(
    records: DataFrame,
    distributions: DataFrame,
    taxon_col: str = "taxonConceptID",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    id_col: str = "occurrenceID",
    max_distribution_rows: int = 50_000,
) -> DataFrame:
    """records x broadcast expert ranges -> (id, taxon, in_range,
    distance_outside_m). Records of taxa without an expert range are not
    tested (reference: only taxa with distributions are checked).

    The expert-range table is a DIMENSION by contract (ALA ships ~1k
    ranges) and is collected to the driver for the broadcast ring map;
    `max_distribution_rows` makes that contract explicit — a table past
    the guard raises instead of silently exhausting driver memory, and
    the fix is to pre-aggregate/simplify the ranges (or raise the guard
    deliberately), not to stream polygons through the executors row-wise.
    """
    from biocache_store_spark.util import (
        ensure_min_parallelism,
        ensure_package_on_workers,
    )

    ensure_package_on_workers(records.sparkSession)
    records = ensure_min_parallelism(records)
    # limit(N+1) bounds the transferred rows even when the guard trips:
    # the driver never materializes more than one row past the cap
    dist_rows = (
        distributions.select("taxonConceptID", "wkt")
        .limit(max_distribution_rows + 1)
        .collect()
    )
    if len(dist_rows) > max_distribution_rows:
        raise ValueError(
            f"find_outliers: distributions has more than "
            f"{max_distribution_rows} rows; expert ranges are a "
            "driver-broadcast dimension — simplify the table or raise "
            "max_distribution_rows explicitly"
        )
    rings = {r["taxonConceptID"]: parse_wkt_polygon(r["wkt"]) for r in dist_rows}
    bc = records.sparkSession.sparkContext.broadcast(rings)

    # taxon restriction via a left-semi join against the (already-small)
    # distribution dim, NOT isin(*keys): tens of thousands of taxa as
    # plan literals balloon the Catalyst tree and serialized plan
    taxon_keys = distributions.select(
        F.col("taxonConceptID").cast("string").alias("taxon")
    ).distinct()
    subset = (
        records.select(
            F.col(id_col).cast("string").alias("occurrence_id"),
            F.col(taxon_col).cast("string").alias("taxon"),
            F.col(lat_col).cast("double").alias("lat"),
            F.col(lon_col).cast("double").alias("lon"),
        )
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .join(F.broadcast(taxon_keys), "taxon", "left_semi")
    )
    if not rings:
        subset = subset.filter(F.lit(False))

    schema = T.StructType(
        [
            T.StructField("occurrence_id", T.StringType()),
            T.StructField("taxon", T.StringType()),
            T.StructField("in_range", T.BooleanType()),
            T.StructField("distance_outside_m", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
