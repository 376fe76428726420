"""Focused tests for util.local_rows_df / util.arrow_rows_df.

These are the round-12 replacements for `spark.createDataFrame(list)`
(the pickled-RDD path): literal relations for O(100)-row dims and the
pandas/Arrow path for larger collected relations. The contract is exact
type/value fidelity with what createDataFrame would have produced —
every call site's oracle hash depends on it.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from biocache_store_spark.util import arrow_rows_df, empty_df, local_rows_df


def _sorted_rows(df):
    return sorted((str(tuple(r)) for r in df.collect()))


def _assert_matches_create(spark, schema, rows):
    """Both constructors must equal createDataFrame(list) row-for-row.

    Schema comparison is on names+types (simpleString): the literal path
    legitimately marks non-null literals non-nullable, which cannot
    change any value."""
    want = spark.createDataFrame(rows, schema)
    got_lit = local_rows_df(spark, schema, rows) if isinstance(schema, str) else None
    got_arrow = arrow_rows_df(spark, schema, rows)
    assert want.schema.simpleString() == got_arrow.schema.simpleString()
    assert _sorted_rows(want) == _sorted_rows(got_arrow)
    if got_lit is not None:
        assert want.schema.simpleString() == got_lit.schema.simpleString()
        assert _sorted_rows(want) == _sorted_rows(got_lit)


def test_scalar_rows_and_nulls(spark):
    _assert_matches_create(
        spark,
        "a int, b string, c double",
        [(1, "x", 1.5), (None, None, None), (2, "", -0.0)],
    )


def test_single_row_fast_path(spark):
    df = local_rows_df(spark, "n int, s string", [(7, "meta")])
    assert df.collect() == [Row(n=7, s="meta")]
    # seed range is pinned to one partition — no empty fan-out tasks
    assert df.rdd.getNumPartitions() == 1


def test_array_and_bool_columns(spark):
    _assert_matches_create(
        spark,
        "k int, v array<double>, f boolean",
        [(1, [0.5, -1.0], True), (2, None, False)],
    )


def test_empty_rows(spark):
    for fn in (local_rows_df, arrow_rows_df):
        df = fn(spark, "a int, b string", [])
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_empty_df_is_optimizer_visible(spark):
    # the point of empty_df over createDataFrame([]): the optimizer must
    # SEE the relation is empty so PropagateEmptyRelation prunes the
    # seeded union/join branch (empty_store in every assertion-lifecycle
    # plan) instead of scanning an opaque empty RDD per branch.
    base = spark.range(3).select(
        F.col("id").cast("int").alias("a"), F.lit("x").alias("b")
    )
    e = empty_df(spark, "a int, b string")
    assert e.count() == 0
    plan = (
        e.unionByName(base, allowMissingColumns=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Union" not in plan
    assert "ExistingRDD" not in plan


def test_large_ids_not_coerced_to_float(spark):
    # pandas would coerce int64-with-None to float64 and corrupt large
    # ids; arrow_rows_df's object-dtype columns must not.
    big = 9007199254740993  # 2**53 + 1: not representable as float64
    rows = [(big, "a"), (None, "b")]
    df = arrow_rows_df(spark, "id long, s string", rows)
    got = {r["s"]: r["id"] for r in df.collect()}
    assert got == {"a": big, "b": None}


def test_arrow_rows_accepts_collected_rows_and_structtype(spark):
    src = spark.range(5).select(
        F.col("id").alias("query_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
    )
    qrows = src.collect()  # list of Row, the ivfpq batch-path input shape
    df = arrow_rows_df(spark, src.schema, qrows)
    assert df.schema == src.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, qrows))


def test_local_rows_df_plans_without_python_worker(spark):
    schema = T.StructType(
        [
            T.StructField("g", T.StringType()),
            T.StructField("lo", T.IntegerType()),
        ]
    )
    df = local_rows_df(spark, "g string, lo int", [("a", 1), ("b", 2)])
    assert df.schema.simpleString() == schema.simpleString()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point: no pickled-RDD scan (ExistingRDD / Scan ExistingRDD)
    assert "ExistingRDD" not in plan


def test_local_rows_df_rejects_arity_mismatch(spark):
    # zip() would silently truncate a short/long row into a relation
    # missing columns where createDataFrame raises; the constructor must
    # raise too (round-12 advisor finding).
    import pytest

    with pytest.raises(ValueError, match="arity"):
        local_rows_df(spark, "a int, b string", [(1,)])
    with pytest.raises(ValueError, match="arity"):
        local_rows_df(spark, "a int, b string", [(1, "x", 3)])


def test_local_rows_df_accepts_structtype(spark):
    st = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    df = local_rows_df(spark, st, [(1, "x")])
    assert df.schema.simpleString() == st.simpleString()
    assert df.collect() == [Row(a=1, b="x")]


def test_nullability_parity_documented(spark):
    # empty_df/local_rows_df/arrow_rows_df do NOT preserve declared
    # non-nullable flags (null literals are nullable; value literals are
    # non-nullable); the driver comparator and every call site compare on
    # simpleString, which ignores nullability. This test pins the
    # DOCUMENTED divergence so a future strict-schema consumer finds the
    # caveat instead of a surprise.
    st = T.StructType([T.StructField("a", T.IntegerType(), nullable=False)])
    e = empty_df(spark, st)
    assert e.schema["a"].nullable is True  # widened — documented in util.py
    assert e.schema.simpleString() == st.simpleString()
