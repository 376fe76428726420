"""Vector math over array<float> embedding columns — pure Column expressions.

Built with F.zip_with / F.aggregate so the arithmetic runs JVM-side per row
(no Python round trip); everything is computed in double precision regardless
of the storage element type so results are reproducible against any oracle.

At 100 TB scale these are the primitives for brute-force cosine top-k
(crossJoin with a broadcast query set) and for the LSH-bucketed variant in
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
