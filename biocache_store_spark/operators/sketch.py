"""Count-min sketch over a string column — bounded-memory frequency
estimation for corpus-scale heavy hitters.

At 100 TB an exact term-frequency table is itself a large relation; the
sketch is the standard one-pass answer: a (depth x width) counter table
whose size is FIXED regardless of corpus size, overestimating counts only
on hash collisions (est >= exact always; P[error] shrinks geometrically
with depth). The reference has no sketch operator — this extends the
engine the way its facet machinery would need at training-data scale.

Determinism-for-verifiability (same design as operators/minhash.py): the
depth hash functions are carved out of ONE md5 per value — hash_d(x) =
the d-th 8-hex-char window of md5(x) — and the bucket id is the first
`bucket_hex` characters of that window AS A STRING (width = 16^bucket_hex
buckets). No hex->integer conversion exists on either side, so the whole
sketch, and every estimate, reproduces bit-identically in ANSI SQL — the
operator has an EXACT DuckDB oracle, not a statistical test.

Scale shape: one explode by depth (a constant 4x fan-out) into one
groupBy with map-side partial aggregation; the sketch table is at most
depth * 16^bucket_hex rows (4 * 4096 by default) — always broadcastable,
which is what makes the estimate join a map-side lookup however large the
probe side is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_BUCKET_HEX = 3  # 16^3 = 4096 buckets per row


def _bucket(value_col: F.Column, d: int, bucket_hex: int) -> F.Column:
    """The d-th hash's bucket: an 8-hex window into md5(value), prefix-
    truncated to the bucket width. d < 4 rides on a single md5 call."""
    if not 1 <= bucket_hex <= 8:
        # wider than 8 would overlap the next depth's 8-hex window (and
        # run past the 32-char digest at d=3), silently breaking the
        # hash-independence the CMS error bound relies on
        raise ValueError("bucket_hex must be in 1..8 (window width per hash)")
    return F.substring(F.md5(value_col), d * 8 + 1, bucket_hex)


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
) -> DataFrame:
    """-> (d, bucket, cnt): the sketch counter table.

    `depth` <= 4 uses one md5 evaluation per input value (the digest's
    four 8-hex windows); larger depths would need a second salted digest —
    keep 4 unless the collision bound genuinely requires more.
    """
    if not 1 <= depth <= 4:
        raise ValueError("depth must be in 1..4 (one md5 carries four hashes)")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(col), d, bucket_hex).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    ).select("db.d", "db.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def estimate_counts(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
) -> DataFrame:
    """probes + `cms_est` = min over the depth rows of the probed buckets.

    The sketch is broadcast — it is bounded by construction (the whole
    point of sketching), so the estimate join never shuffles the probe
    side."""
    # min over the depth estimates as a single left-to-right LEAST of
    # per-depth lookup columns — no explode, no groupBy, so duplicate
    # probe rows stay distinct rows (the row-per-probe contract) and no
    # probe column name can collide with sketch internals
    out = probes
    est_cols = []
    for d in range(depth):
        per_d = sketch.filter(F.col("d") == d).select(
            F.col("bucket").alias(f"__cms_b{d}"),
            F.col("cnt").alias(f"__cms_c{d}"),
        )
        out = out.join(
            F.broadcast(per_d),
            _bucket(F.col(col), d, bucket_hex) == F.col(f"__cms_b{d}"),
            "left",
        ).drop(f"__cms_b{d}")
        est_cols.append(F.coalesce(F.col(f"__cms_c{d}"), F.lit(0)))
    est = est_cols[0] if depth == 1 else F.least(*est_cols)
    return out.withColumn("cms_est", est).drop(
        *[f"__cms_c{d}" for d in range(depth)]
    )


def _hist_bin(value_col: str, lo: float, hi: float, n_bins: int):
    """The fixed-grid bin index: clamp(floor((v-lo)*nb/(hi-lo)), 0, nb-1).
    Shared by the cut plan and the refinement's bin-0 membership filter so
    membership is decided by the EXACT same double expression."""
    v, lo_l, hi_l, nb = (
        F.col(value_col),
        F.lit(float(lo)),
        F.lit(float(hi)),
        F.lit(float(n_bins)),
    )
    # clamp BEFORE the int cast: floor() yields BIGINT, and an extreme
    # value (-inf clamps in as Long.MIN_VALUE) would overflow the ANSI
    # int cast before least/greatest ever ran
    return F.least(
        F.greatest(
            F.floor(((v - lo_l) * nb) / (hi_l - lo_l)), F.lit(0).cast("bigint")
        ),
        F.lit(n_bins - 1).cast("bigint"),
    ).cast("int")


def _cum_hist(
    values: DataFrame, lo: float, hi: float, n_bins: int, value_col: str
) -> DataFrame:
    """<= n_bins rows: (bin, from-the-top cumulative count, total)."""
    from pyspark.sql.window import Window

    hist = values.groupBy(
        _hist_bin(value_col, lo, hi, n_bins).alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
    )


def _cut_from_rows(rows, k: int):
    """Driver-side replica of the cut pick over the collected (tiny)
    cumulative histogram, for an INTEGER target count k:
    (cut_bin, covered, total). k stays an integer end to end so the
    refinement's second pass cuts at exactly k_rem — re-deriving it as
    ceil(n0 * (k_rem/n0)) could land one off under IEEE rounding."""
    # NULL bins cannot arise from _hist_bin (greatest(NULL, 0) = 0 clamps
    # NULL values into bin 0); the None-guards here are defensive, for
    # any future bin expression that does emit a NULL group
    if not rows or all(r["bin"] is None for r in rows):
        raise ValueError(
            "histogram_threshold: no values to derive a threshold from"
        )
    total = rows[0]["total"]
    admitted = [r for r in rows if r["cum"] >= k]
    bins = [r["bin"] for r in admitted if r["bin"] is not None]
    if not bins:
        # only the NULL-bin row reaches the target count (NULL values
        # outnumber the non-NULL total): same designed error the lazy
        # plan's raise_error emits for this input, not a bare max() crash
        raise ValueError(
            "histogram_threshold: no values to derive a threshold from"
        )
    return (max(bins), min(r["cum"] for r in admitted), total)


def histogram_threshold(
    values: DataFrame,
    fraction: float,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    value_col: str = "importance",
    refine: int = 1,
) -> DataFrame:
    """Derive a keep-threshold for the top `fraction` of a value column
    from a FIXED-GRID histogram — the 100 TB replacement for an exact
    rank: no total order anywhere, just one bounded groupBy (<= n_bins
    rows, map-side combined) and a window over the tiny histogram.

    The threshold is the lower edge of the highest bin at which the
    from-the-top cumulative count reaches ceil(fraction * total), so
    `value >= threshold` keeps AT LEAST the requested fraction,
    over-selecting by at most one bin's worth (tighten with n_bins).
    Values outside [lo, hi) clamp into the edge bins: everything >= hi
    is always kept. When the cut lands in the BOTTOM bin the grid can
    no longer discriminate there (bin 0 holds [lo, lo+w) AND every
    clamped below-lo value), so with `refine` >= 1 ONE refinement pass
    re-histograms just the bin-0 rows over [min(bin-0 values), lo+w) —
    two extra bounded aggregations — and cuts inside it; only if that
    refined cut is again degenerate (or refine=0) does the threshold
    fall back to keep-everything: min(bin-0 values) when known (refined
    path), -Infinity in the refine=0 legacy plan.

    Determinism: the bin index and both edges are single double
    expressions over plan literals (the driver-side refinement replays
    the identical IEEE arithmetic), so any engine reproduces the exact
    threshold — unlike percentile_approx, whose sketch is
    implementation-defined. Returns one row:
    (threshold, covered, total) — covered = binned rows at or above the
    cut. Empty input raises (no distribution to derive from) rather
    than returning a NULL threshold that would silently select nothing.
    With refine >= 1 the result is computed eagerly (the collected
    histogram is <= n_bins rows — dimension-sized by construction);
    refine=0 keeps the fully-lazy single-plan shape.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError("histogram_threshold: fraction must be in (0, 1]")
    if not hi > lo:
        raise ValueError("histogram_threshold: need hi > lo")
    cum = _cum_hist(values, lo, hi, n_bins, value_col)
    if refine <= 0:
        k = F.ceil(F.col("total") * F.lit(float(fraction)))
        lo_l, hi_l, nb = F.lit(float(lo)), F.lit(float(hi)), F.lit(float(n_bins))
        edge = lo_l + F.max("bin").cast("double") * (hi_l - lo_l) / nb
        threshold = F.when(
            F.max("bin").isNull(),
            F.expr(
                "CAST(raise_error('histogram_threshold: no values to"
                " derive a threshold from') AS DOUBLE)"
            ),
        ).otherwise(
            F.when(F.max("bin") == 0, F.lit(float("-inf"))).otherwise(edge)
        )
        return (
            cum.filter(F.col("cum") >= k)
            .groupBy()
            .agg(
                threshold.alias("threshold"),
                F.min("cum").alias("covered"),
                F.first("total").alias("total"),
            )
        )
    import math

    rows = cum.collect()
    k1 = (
        math.ceil(rows[0]["total"] * float(fraction)) if rows else 0
    )  # Python floats ARE IEEE doubles: reproduces the plan's ceil exactly
    cut_bin, covered, total = _cut_from_rows(rows, k1)
    if cut_bin > 0:
        threshold = lo + cut_bin * (hi - lo) / n_bins
    else:
        # refinement: the cut fell in bin 0. Re-histogram ONLY the bin-0
        # rows over [their true minimum, lo+w) and cut inside it — the
        # membership filter reuses the pass-1 bin expression so float
        # edge cases cannot shift rows between passes. `above`/`n0` come
        # from the cum rows directly so NULL-value rows (which bin to a
        # NULL group and can never be selected by a >= compare) are
        # excluded from both the numerator and the denominator.
        above = max(
            (
                r["cum"]
                for r in rows
                if r["bin"] is not None and r["bin"] >= 1
            ),
            default=0,
        )
        cum_bin0 = next(r["cum"] for r in rows if r["bin"] == 0)
        n0 = cum_bin0 - above
        k_rem = min(n0, k1 - above)
        subset = values.filter(_hist_bin(value_col, lo, hi, n_bins) == 0)
        lo2 = subset.agg(
            F.min(F.col(value_col).cast("double")).alias("m")
        ).collect()[0]["m"]
        hi2 = lo + (hi - lo) / n_bins  # bin 0's upper edge
        # math.isfinite: a -inf value clamps into bin 0 and passes the
        # hi2 > lo2 test, but a grid anchored at -inf makes every edge
        # expression -inf + inf = NaN and 'value >= NaN' silently selects
        # NOTHING — the exact failure this function exists to prevent
        if lo2 is not None and math.isfinite(lo2) and hi2 > lo2:
            rows2 = _cum_hist(subset, lo2, hi2, n_bins, value_col).collect()
            cut2, covered2, _ = _cut_from_rows(rows2, k_rem)
            covered = above + covered2
            # refined bottom bin: nothing exists below lo2, so lo2 IS
            # keep-everything-in-bin-0, finite — never -inf
            threshold = (
                lo2 + cut2 * (hi2 - lo2) / n_bins if cut2 > 0 else lo2
            )
        else:
            # the bin cannot be subdivided: all values identical (keep
            # them at their exact value) or the minimum is -inf (a grid
            # anchored there is NaN everywhere — fall back to the legacy
            # keep-everything threshold rather than an empty selection)
            threshold = (
                lo2 if lo2 is not None and math.isfinite(lo2)
                else float("-inf")
            )
    from biocache_store_spark.util import local_rows_df

    return local_rows_df(
        values.sparkSession,
        "threshold double, covered long, total long",
        [(float(threshold), int(covered), int(total))],
    )
