"""Vector math over array<float> embedding columns.

Two tiers, both computing in double precision regardless of the storage
element type and both summing strictly left-to-right, so their floating-point
results are bit-identical to each other and to any sequential-sum oracle:

  * Column-expression tier (`dot`/`norm`/`cosine_similarity`): F.zip_with /
    F.aggregate higher-order functions. JVM-side per row, but Spark 4 runs
    HOF lambdas INTERPRETED (documented repo trap), and unrolling the loop
    into flat getItem sums overflows janino's 64 KB method limit at
    dim >= ~64 once Catalyst duplicates the expression into pushed filters
    (measured: codegen ERROR + interpreted fallback). So this tier is kept
    for generic/cheap call sites only.
  * Arrow tier (`cosine_similarity_arrow`/`norm_arrow`): a vectorized
    pandas_udf accumulating per-dimension over the whole Arrow batch
    (`acc += A[:, i] * B[:, i]`) — the identical left-assoc addition order
    per row, so results match the HOF tier bit-for-bit, at ~2x its warm
    throughput (measured on a 200k-row scan, 3.9 s -> 2.0 s per run).
    This is the scale path for every embedding-heavy site: brute-force
    scoring, LSH/IVF re-rank, pairwise near-dup verification.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array columns, in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (double)."""
    return dot(a, b) / (norm(a) * norm(b))


def _accumulate_sequential(A, B):
    """(dot, |A|^2, |B|^2) per row, accumulated dimension-by-dimension so
    each row's additions happen in exactly the left-to-right order the HOF
    tier (and a sequential-sum SQL oracle) uses."""
    dot = A[:, 0] * B[:, 0]
    na = A[:, 0] * A[:, 0]
    nb = B[:, 0] * B[:, 0]
    for i in range(1, A.shape[1]):
        dot = dot + A[:, i] * B[:, i]
        na = na + A[:, i] * A[:, i]
        nb = nb + B[:, i] * B[:, i]
    return dot, na, nb


@pandas_udf(DoubleType())
def cosine_similarity_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine similarity; bit-identical to the HOF tier.

    Fixed-dimension contract: every non-null array in a batch must have the
    same length (the embedding-column invariant). Null inputs yield null."""
    import numpy as np

    out = pd.Series([None] * len(a), dtype="Float64")
    mask = a.notna() & b.notna()
    if mask.any():
        A = np.stack(a[mask].to_numpy()).astype(np.float64)
        B = np.stack(b[mask].to_numpy()).astype(np.float64)
        dot, na, nb = _accumulate_sequential(A, B)
        out[mask.to_numpy()] = dot / (np.sqrt(na) * np.sqrt(nb))
    return out


@pandas_udf(DoubleType())
def norm_arrow(a: pd.Series) -> pd.Series:
    """Arrow-batched L2 norm; bit-identical to the HOF tier."""
    import numpy as np

    out = pd.Series([None] * len(a), dtype="Float64")
    mask = a.notna()
    if mask.any():
        A = np.stack(a[mask].to_numpy()).astype(np.float64)
        acc = A[:, 0] * A[:, 0]
        for i in range(1, A.shape[1]):
            acc = acc + A[:, i] * A[:, i]
        out[mask.to_numpy()] = np.sqrt(acc)
    return out


# Single-evaluation variant for call sites that FILTER directly on the
# UDF's output column. Catalyst pushes such a filter below the projection
# that computes the column and, as of Spark 4, duplicates the UDF instead
# of moving it: one ArrowEvalPython below the filter plus a second one
# re-computing the survivors for the final projection (guide-documented
# optimizer behavior; observed in this repo's threshold-similarity plans).
# asNondeterministic() forbids the optimizer from duplicating/reordering
# the expression, collapsing the plan to ONE ArrowEvalPython; the function
# itself is pure, so results are unchanged. Keep using the plain variant
# anywhere the output is only projected or window-ordered (no duplication
# there, and nondeterminism would block legitimate filter pushdown).
cosine_similarity_arrow_once = cosine_similarity_arrow.asNondeterministic()


def euclidean_distance(a: Column, b: Column) -> Column:
    """L2 distance of two array columns (double)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
