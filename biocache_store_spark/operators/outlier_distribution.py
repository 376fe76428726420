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

from biocache_store_spark.operators.sampling import (
    parse_wkt_polygon,
    point_in_polygon,
    points_in_polygon_np,
)

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
    d2 = dx * dx + dy * dy
    # guard on the DENOMINATOR, not the deltas: subnormal deltas can be
    # nonzero while dx*dx + dy*dy underflows to 0.0 (hypothesis-found);
    # the vectorized twin already branches on denom == 0
    if d2 == 0:
        return math.sqrt((px - ax) * (px - ax) + (py - ay) * (py - ay))
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / d2))
    cx, cy = ax + t * dx, ay + t * dy
    # explicit sqrt(x*x + y*y), NOT math.hypot: CPython's hypot is
    # correctly rounded while np.hypot is libm (1 ulp apart on ~1/50k
    # inputs, hypothesis-found) — the explicit form is the same IEEE op
    # sequence in both kernels, so parity is by construction. Metre
    # magnitudes (<~1e8 for real coordinates) are nowhere near the
    # squared-overflow regime hypot exists to dodge.
    ex, ey = px - cx, py - cy
    return math.sqrt(ex * ex + ey * ey)


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


def distances_outside_m_np(lon, lat, ring: list[tuple[float, float]]):
    """Vectorized distance_outside_m over whole NumPy arrays of points —
    the expert-range twin of points_in_polygon_np (SCALE.md round-9):
    inside-ness comes from the vectorized ray cast, and for the outside
    points every boundary segment is evaluated as ~10 vector ops with
    the SAME operand order as _point_segment_distance_m (projection
    parameter clamped to [0,1], same equirectangular scaling, explicit
    sqrt(x*x + y*y) on both sides — np.hypot and math.hypot are NOT the
    same function: CPython's is correctly rounded), so the two agree
    bit-for-bit
    (parity test, including on-edge points and degenerate zero-length
    segments). Replaces a per-record Python loop whose cost grew with
    ring size; the vector form is flat in it."""
    import numpy as np

    lon = np.asarray(lon, dtype=float)
    lat = np.asarray(lat, dtype=float)
    out = np.zeros(len(lon))
    outside = ~points_in_polygon_np(lon, lat, ring)
    if not outside.any():
        return out
    if len(ring) < 2:
        raise ValueError("degenerate ring: need at least 2 vertices")
    plon, plat = lon[outside], lat[outside]
    cos_lat = np.cos(np.radians(plat))
    px = plon * _M_PER_DEG_LON * cos_lat
    py = plat * _M_PER_DEG_LAT
    segments = [(ring[i], ring[i + 1]) for i in range(len(ring) - 1)]
    if ring[0] != ring[-1]:
        segments.append((ring[-1], ring[0]))
    best = np.full(plon.shape, np.inf)
    with np.errstate(divide="ignore", invalid="ignore"):
        for a, b in segments:
            ax = a[0] * _M_PER_DEG_LON * cos_lat
            ay = a[1] * _M_PER_DEG_LAT
            bx = b[0] * _M_PER_DEG_LON * cos_lat
            by = b[1] * _M_PER_DEG_LAT
            dx, dy = bx - ax, by - ay
            denom = dx * dx + dy * dy
            degenerate = denom == 0.0
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / denom, 0.0, 1.0)
            cx, cy = ax + t * dx, ay + t * dy
            # explicit sqrt(x*x + y*y) mirrors the scalar kernel op
            # for op (np.hypot is libm, 1 ulp off CPython's hypot)
            gx, gy = px - ax, py - ay
            ex, ey = px - cx, py - cy
            d = np.where(
                degenerate,
                np.sqrt(gx * gx + gy * gy),
                np.sqrt(ex * ex + ey * ey),
            )
            best = np.minimum(best, d)
    out[outside] = best
    return out


def find_outliers(
    records: DataFrame,
    distributions: DataFrame,
    taxon_col: str = "taxonConceptID",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    id_col: str = "occurrenceID",
    max_distribution_rows: int = 50_000,
    uncertainty_col: str | None = None,
) -> DataFrame:
    """records x broadcast expert ranges -> (id, taxon, in_range,
    distance_outside_m — RAW metres, unrounded: every consumer of the
    reference applies its own single Math.round to the raw distance,
    so pre-rounding here would double-round; queries display-round).
    Records of taxa without an expert range are not tested (reference:
    only taxa with distributions are checked).
    `uncertainty_col` (optional) passes the record's
    coordinateUncertaintyInMeters through to an `uncertainty_m` output
    column — the outlier-vs-uncertainty test downstream
    (expert_outlier_records) needs it without re-joining the record side.

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
    extra = (
        [F.col(uncertainty_col).cast("double").alias("uncertainty_m")]
        if uncertainty_col is not None
        else []
    )
    subset = (
        records.select(
            F.col(id_col).cast("string").alias("occurrence_id"),
            F.col(taxon_col).cast("string").alias("taxon"),
            F.col(lat_col).cast("double").alias("lat"),
            F.col(lon_col).cast("double").alias("lon"),
            *extra,
        )
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .join(F.broadcast(taxon_keys), "taxon", "left_semi")
    )
    if not rings:
        subset = subset.filter(F.lit(False))

    fields = [
        T.StructField("occurrence_id", T.StringType()),
        T.StructField("taxon", T.StringType()),
        T.StructField("in_range", T.BooleanType()),
        T.StructField("distance_outside_m", T.DoubleType()),
    ]
    if uncertainty_col is not None:
        fields.append(T.StructField("uncertainty_m", T.DoubleType()))
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        local = bc.value
        for pdf in batches:
            # one vectorized kernel call per taxon in the batch instead
            # of a per-record Python ray cast + segment loop — same
            # values bit-for-bit (distances_outside_m_np parity test).
            # RAW metres, deliberately unrounded: the reference's outlier
            # rule and stored km/comment all apply ONE Math.round to the
            # raw distance (ExpertDistributionOutlierTool.scala:474-488);
            # pre-rounding here to 0.1 m would double-round and flip
            # records in the (x.445, x.5) band at the 50 km boundary.
            # Hash-stability display rounding is the query layer's job.
            dist = np.zeros(len(pdf))
            for taxon, idx in pdf.groupby("taxon").indices.items():
                dist[idx] = distances_outside_m_np(
                    pdf["lon"].values[idx], pdf["lat"].values[idx], local[taxon]
                )
            out = {
                "occurrence_id": pdf["occurrence_id"],
                "taxon": pdf["taxon"],
                "in_range": [d == 0.0 for d in dist],
                "distance_outside_m": dist,
            }
            if uncertainty_col is not None:
                out["uncertainty_m"] = pdf["uncertainty_m"]
            yield pd.DataFrame(out)

    return subset.mapInPandas(run, schema=schema)


#: the reference's distanceThreshold default: an occurrence is only an
#: outlier when it sits more than 50 km outside the expert range beyond
#: its own coordinate uncertainty (ExpertDistributionOutlierTool.scala:51)
DISTANCE_THRESHOLD_M = 50_000.0


def expert_outlier_records(
    records: DataFrame,
    distributions: DataFrame,
    distance_threshold_m: float = DISTANCE_THRESHOLD_M,
    taxon_col: str = "taxonConceptID",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    id_col: str = "occurrenceID",
    uncertainty_col: str = "coordinateUncertaintyInMeters",
    max_distribution_rows: int = 50_000,
) -> DataFrame:
    """The persistable record-level expert-distribution outlier result —
    one row per TESTED record (a record of a taxon with an expert range
    and non-null coordinates), the relation the reference spreads across
    the `distribution_outliers` column family plus the per-record occ
    writes (tool/ExpertDistributionOutlierTool.scala markOutlierOccurrences
    :459-510).

    Outlier rule (:474-480): the metre distance is rounded, and the record
    is an outlier iff `round(distance) > 0` AND
    `round(distance) - coordinateUncertaintyInMeters > distance_threshold_m`
    (null uncertainty reads as 0, the reference's getOrElse("0")). Tested
    records that fail the rule are the PASSED set QaPasser marks.
    `distance_outside_km` carries the reference's stored value —
    `round(metres / 1000)` (:487-488) — only on outlier rows.

    Scale shape: one broadcast-dim pass over the record table
    (find_outliers); the store is ingest-proportional (tested records
    only) and merges incrementally via merge_outlier_results with
    group_cols=['taxon'] — the same versioned replace-touched-groups
    contract the jackknife and duplicate stores use.

    UPGRADE NOTE (pre-round-9 stores): stores written before
    `distance_outside_m` switched to RAW metres hold 0.1-pre-rounded
    distances and double-rounded is_outlier flags. An incremental merge
    keeps those stale rows for untouched taxa, so a standing store built
    with the old kernel needs ONE full (non-incremental) rebuild before
    resuming incremental merges — a mixed-epoch store would persist
    wrong flags in the (x.445, x.5) band until every taxon happens to be
    touched. There is no reliable in-band detector (a raw distance can
    legitimately have one decimal), so this is a documented operational
    requirement, echoed in DEPLOY.md."""
    if uncertainty_col not in records.columns:
        records = records.withColumn(
            uncertainty_col, F.lit(None).cast("double")
        )
    tested = find_outliers(
        records,
        distributions,
        taxon_col=taxon_col,
        lat_col=lat_col,
        lon_col=lon_col,
        id_col=id_col,
        max_distribution_rows=max_distribution_rows,
        uncertainty_col=uncertainty_col,
    )
    rounded = F.round(F.col("distance_outside_m"), 0)
    is_outlier = (rounded > 0) & (
        (rounded - F.coalesce(F.col("uncertainty_m"), F.lit(0.0)))
        > F.lit(float(distance_threshold_m))
    )
    return tested.select(
        F.col("taxon"),
        F.col("occurrence_id").alias("row_key"),
        "in_range",
        "distance_outside_m",
        F.when(
            is_outlier,
            F.round(F.col("distance_outside_m") / 1000.0, 0).cast("bigint"),
        ).alias("distance_outside_km"),
        is_outlier.alias("is_outlier"),
    )


def distribution_outliers_rollup(record_store: DataFrame) -> DataFrame:
    """Per-taxon sorted outlier row-key list — the `distribution_outliers`
    column family the reference keys by lsid (conf/cassandra3_schema.txt:26,
    written at ExpertDistributionOutlierTool.scala:538-540 as a JSON array
    per taxon). One row per taxon that currently HAS outliers."""
    return (
        record_store.filter(F.col("is_outlier"))
        .groupBy("taxon")
        .agg(
            F.sort_array(F.collect_set("row_key")).alias("outlier_row_keys"),
            F.countDistinct("row_key").cast("int").alias("outlier_count"),
        )
    )


def apply_expert_outlier_markup(
    store: DataFrame,
    record_store: DataFrame,
    reverts: DataFrame | None = None,
    key_col: str = "rowKey",
    assertions_col: str = "assertions",
) -> DataFrame:
    """Write the expert-distribution results onto a processed store — the
    per-record half of markOutlierOccurrences
    (tool/ExpertDistributionOutlierTool.scala:459-528) as one join pass:

      * outliers get `distanceOutsideExpertRange_p` = round(m/1000) km as
        a string (:487-488, the reference's km.toString put) and a FAILED
        SPECIES_OUTSIDE_EXPERT_RANGE assertion
        '<rounded> metres outside of expert distribution range' replacing
        any existing entry of that code (:484 replaceExistCode=true);
      * tested non-outliers get the PASSED entry QaPasser writes (:87,
        qa/QaPasser.scala markRecords) and the distance column CLEARED —
        the end state the reference reaches via its reset diff + passer;
      * records in `reverts` (obsolete_expert_outliers: outliers in the
        previous store, absent from the current one — e.g. no longer
        tested) get the column cleared and the assertion REMOVED
        (:525-526 deleteColumns + removeSystemAssertion — removal, not a
        passed flip, unlike the jackknife reset);
      * everything else passes through verbatim.

    The distance lands in the `_p`-suffixed column (the flat-store twin of
    the reference's ':p' qualifier), which the index projection serves as
    `distance_outside_expert_range` (IndexDAO.scala:282,733). Array
    surgery is JVM-side; the record-store and revert sides join as
    ingest-sized relations."""
    from biocache_store_spark.processors.assertions import (
        FAILED,
        PASSED,
        AssertionCodes,
    )

    code = AssertionCodes.SPECIES_OUTSIDE_EXPERT_RANGE.code
    name = AssertionCodes.SPECIES_OUTSIDE_EXPERT_RANGE.name
    marks = record_store.select(
        F.col("row_key").alias("__eo_key"),
        F.col("is_outlier").alias("__eo_out"),
        F.round(F.col("distance_outside_m"), 0).cast("bigint").alias(
            "__eo_m"
        ),
        F.col("distance_outside_km").cast("string").alias("__eo_km"),
    )
    out = store.join(
        marks, store[key_col] == F.col("__eo_key"), "left"
    ).drop("__eo_key")
    if reverts is not None:
        rv = reverts.select(
            F.col("row_key").alias("__rv_key"), F.lit(True).alias("__revert")
        )
        out = out.join(rv, out[key_col] == F.col("__rv_key"), "left").drop(
            "__rv_key"
        )
    else:
        out = out.withColumn("__revert", F.lit(None).cast("boolean"))
    dist_col = "distanceOutsideExpertRange_p"
    existing_dist = (
        F.col(dist_col)
        if dist_col in store.columns
        else F.lit(None).cast("string")
    )
    out = out.withColumn(
        dist_col,
        F.when(F.coalesce(F.col("__eo_out"), F.lit(False)), F.col("__eo_km"))
        .when(
            F.col("__eo_out").isNotNull()
            | F.coalesce(F.col("__revert"), F.lit(False)),
            F.lit(None).cast("string"),
        )
        .otherwise(existing_dist),
    )
    # null-safe: filter(NULL)/array_append(NULL, x) return NULL, silently
    # dropping the markup on rows whose assertions column is null
    existing_arr = F.coalesce(
        F.col(assertions_col),
        F.array().cast(store.schema[assertions_col].dataType),
    )
    cleaned = F.filter(existing_arr, lambda a: a["code"] != F.lit(code))
    failed = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(FAILED).alias("qa_status"),
        F.concat(
            F.col("__eo_m"),
            F.lit(" metres outside of expert distribution range"),
        ).alias("comment"),
    )
    passed = F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.lit(PASSED).alias("qa_status"),
        F.lit("").alias("comment"),
    )
    new_assertions = (
        F.when(F.coalesce(F.col("__eo_out"), F.lit(False)), F.array_append(cleaned, failed))
        .when(F.col("__eo_out").isNotNull(), F.array_append(cleaned, passed))
        .when(F.coalesce(F.col("__revert"), F.lit(False)), cleaned)
        .otherwise(F.col(assertions_col))
    )
    return out.withColumn(assertions_col, new_assertions).drop(
        "__eo_out", "__eo_m", "__eo_km", "__revert"
    )


def obsolete_expert_outliers(
    previous: DataFrame, current: DataFrame
) -> DataFrame:
    """Record ids flagged outliers in the previous store but no longer in
    the current one — the reference's `oldRowKeys diff newOutlierRowKeys`
    reset set (:515-528). Same diff as the jackknife store's, re-exported
    under the family's own name."""
    from biocache_store_spark.operators.outlier_store import (
        obsolete_outlier_records,
    )

    return obsolete_outlier_records(previous, current)
