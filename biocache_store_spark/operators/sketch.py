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
    probed = probes.select(
        "*",
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
        ).alias("db"),
    ).select("*", "db.d", "db.bucket").drop("db")
    joined = probed.join(F.broadcast(sketch), ["d", "bucket"], "left")
    group_cols = [c for c in probes.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )
