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


def histogram_threshold(
    values: DataFrame,
    fraction: float,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    value_col: str = "importance",
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
    is always kept; when the cut lands in the BOTTOM bin the grid can
    no longer discriminate and the threshold degenerates to -Infinity —
    everything is kept, INCLUDING values below lo (the edge `lo` itself
    would silently exclude below-lo rows that were counted toward the
    fraction, breaking the at-least guarantee).

    Determinism: the bin index and both edges are single double
    expressions over plan literals, so any engine reproduces the exact
    threshold — unlike percentile_approx, whose sketch is
    implementation-defined. Returns one row:
    (threshold, covered, total) — covered = binned rows at or above the
    cut bin. Empty input raises (no distribution to derive from) rather
    than returning a NULL threshold that would silently select nothing.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError("histogram_threshold: fraction must be in (0, 1]")
    if not hi > lo:
        raise ValueError("histogram_threshold: need hi > lo")
    v, lo_l, hi_l, nb = (
        F.col(value_col),
        F.lit(float(lo)),
        F.lit(float(hi)),
        F.lit(float(n_bins)),
    )
    bin_ = F.least(
        F.greatest(
            F.floor(((v - lo_l) * nb) / (hi_l - lo_l)).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    hist = values.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql.window import Window

    w_cum = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
    )
    k = F.ceil(F.col("total") * F.lit(float(fraction)))
    edge = lo_l + F.max("bin").cast("double") * (hi_l - lo_l) / nb
    # bottom-bin degeneracy: bin 0 holds [lo, lo+w) AND every clamped
    # below-lo value, so its edge must be -inf, not lo; empty input
    # leaves max(bin) NULL — raise instead of emitting a NULL threshold
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
