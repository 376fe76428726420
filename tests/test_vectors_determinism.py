"""Pins for the Arrow vector-function tier (functions/vectors.py).

Round-12 advisor finding: `asNondeterministic()` mutates the wrapped
UserDefinedFunction IN PLACE on PySpark 4.1, so deriving the `_once`
variant from the shared `cosine_similarity_arrow` silently made the
plain variant nondeterministic at import time too — blocking filter
pushdown at every plain call site. The `_once` variant must be a
distinct instance over the raw kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from biocache_store_spark.functions.vectors import (
    _cosine_batch,
    _norm_batch,
    cosine_similarity_arrow,
    cosine_similarity_arrow_once,
    norm_arrow,
)


def test_plain_variant_stays_deterministic_after_import():
    # importing the module creates the _once variant; the plain variants
    # must remain deterministic (distinct underlying UDF instances).
    assert cosine_similarity_arrow._unwrapped.deterministic is True
    assert norm_arrow._unwrapped.deterministic is True
    assert cosine_similarity_arrow_once._unwrapped.deterministic is False
    assert (
        cosine_similarity_arrow._unwrapped
        is not cosine_similarity_arrow_once._unwrapped
    )


def _list_arr(rows, typ=pa.float32()):
    return pa.array(rows, type=pa.list_(typ))


def test_cosine_kernel_null_and_nan_to_null():
    a = _list_arr([[1.0, 2.0], None, [0.0, 0.0], [1.0, 0.0]])
    b = _list_arr([[3.0, 4.0], [1.0, 1.0], [3.0, 4.0], None])
    out = _cosine_batch(a, b)
    assert out.type == pa.float64()
    vals = out.to_pylist()
    assert vals[1] is None and vals[3] is None  # null inputs
    assert vals[2] is None  # zero-norm NaN -> null (old pandas semantics)
    assert vals[0] is not None


def test_cosine_kernel_matches_numpy_and_sliced_input():
    rng = np.random.default_rng(7)
    M = rng.random((64, 16)).astype(np.float32)
    Q = rng.random((64, 16)).astype(np.float32)
    a = _list_arr([list(map(float, r)) for r in M])
    b = _list_arr([list(map(float, r)) for r in Q])
    full = np.asarray(_cosine_batch(a, b))
    # reference: per-dimension left-assoc accumulation in float64
    A, B = M.astype(np.float64), Q.astype(np.float64)
    dot = A[:, 0] * B[:, 0]
    na = A[:, 0] * A[:, 0]
    nb = B[:, 0] * B[:, 0]
    for i in range(1, 16):
        dot = dot + A[:, i] * B[:, i]
        na = na + A[:, i] * A[:, i]
        nb = nb + B[:, i] * B[:, i]
    ref = dot / (np.sqrt(na) * np.sqrt(nb))
    assert np.array_equal(full, ref)  # bit-identical
    # non-zero-offset slices (what a downstream arrow op can hand the
    # kernel) must resolve offsets correctly
    sl = np.asarray(_cosine_batch(a.slice(5, 20), b.slice(5, 20)))
    assert np.array_equal(sl, ref[5:25])


def test_norm_kernel_nulls_and_values():
    a = _list_arr([[3.0, 4.0], None])
    out = _norm_batch(a)
    vals = out.to_pylist()
    assert vals[0] == 5.0 and vals[1] is None
