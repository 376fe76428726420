"""Runtime utilities."""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession

_SHIPPED_FLAG = "spark.biocache.pyfilesShipped"


def _package_fingerprint(pkg_dir: str) -> tuple[str, list[str]]:
    """Hash of (path, size, mtime) over all package sources — the zip is
    rebuilt whenever any source changes (a stale cached zip once shipped a
    version without newer submodules)."""
    files = []
    h = hashlib.sha1()
    for root, _dirs, names in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for name in sorted(names):
            if not name.endswith(".py"):
                continue
            full = os.path.join(root, name)
            st = os.stat(full)
            h.update(
                f"{os.path.relpath(full, pkg_dir)}:{st.st_size}:{st.st_mtime_ns}".encode()
            )
            files.append(full)
    return h.hexdigest()[:12], files


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to executor Python workers.

    Functions referenced from mapInPandas / UDFs are pickled *by reference*
    to their module, so the workers must be able to import
    biocache_store_spark. A host session (e.g. the external driver's) is not
    necessarily launched with the repo on PYTHONPATH — zip the package once
    and addPyFile it so every worker can import it regardless of the
    driver's working directory.
    """
    try:
        if spark.conf.get(_SHIPPED_FLAG, "") == "true":
            return
    except Exception:
        pass
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fingerprint, files = _package_fingerprint(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"biocache_store_spark_pyfiles_{fingerprint}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for full in files:
                rel = os.path.join(
                    "biocache_store_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
        os.replace(tmp, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    try:
        spark.conf.set(_SHIPPED_FLAG, "true")
    except Exception:
        pass


def empty_df(spark, schema) -> "DataFrame":
    """Zero-row relation that the optimizer can SEE is empty.

    `spark.createDataFrame([], schema)` plans as a pickled-RDD scan of an
    empty RDD — an opaque node, so a union/join against it keeps both
    branches in the plan. Building it as typed-null literals filtered by
    `false` optimizes to an empty LocalRelation, and
    PropagateEmptyRelation then prunes the seeded union/join branch
    outright (measured: add_user_assertions(empty_store, rows) loses the
    Union and the empty-side scan).

    Nullability caveat (shared with `local_rows_df`/`arrow_rows_df`): the
    literal construction marks every field nullable, whereas
    `createDataFrame([], schema)` honored declared non-nullable fields.
    No caller declares non-nullable schemas and the driver comparator
    ignores nullability (simpleString parity is pinned by
    tests/test_util_local_rows.py); revisit only if a strict-schema
    consumer appears."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    return (
        spark.range(0, 1, 1, 1)
        .select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
        .where(F.lit(False))
    )


def local_rows_df(spark, schema, rows) -> "DataFrame":
    """Small literal relation built JVM-side instead of createDataFrame.

    `spark.createDataFrame(list)` always takes the pickled-RDD path (the
    Arrow fast path only covers pandas inputs), so the relation scans
    through a Python worker on EVERY action: measured 4.5-7 s per one-row
    parquet write and ~0.26 s per broadcast-hash-join build at sf0.1.
    Building the same rows as plan literals (range(1) -> explode(array(
    struct(...)))) keeps them in the JVM: 0.18 s / ~0.12 s for the same
    two shapes (guide §4 — eliminate the Python boundary).

    Intended for dimension/metadata relations of O(100) rows whose values
    are plain Python scalars, lists, or None — every row is cast to the
    declared `schema` (DDL string or StructType) field-by-field, so types
    match createDataFrame's exactly (nullability excepted — see
    `empty_df`). Large collected relations (thousands of rows) should NOT
    go through literals (plan bloat); convert those via pandas (Arrow
    path) instead."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    if not rows:
        return empty_df(spark, st)
    for r in rows:
        if len(r) != len(st.fields):
            # zip() would silently truncate where createDataFrame raises
            raise ValueError(
                f"row arity {len(r)} != schema arity {len(st.fields)}: {r!r}"
            )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for f, v in zip(st.fields, r)
            ]
        )
        for r in rows
    ]
    # numPartitions=1: the default spark.range(1) fans the single seed row
    # over defaultParallelism partitions, costing ~31 empty tasks per action
    one = spark.range(0, 1, 1, 1)
    if len(structs) == 1:
        return one.select(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for f, v in zip(st.fields, rows[0])
            ]
        )
    return (
        one.select(F.explode(F.array(*structs)).alias("__r"))
        .select("__r.*")
    )


def arrow_rows_df(spark, schema, rows) -> "DataFrame":
    """Collected-relation constructor through pandas/Arrow.

    For relations too large for plan literals (ADC tables, codebooks,
    collected query batches), `createDataFrame(pandas_df, schema)` takes
    the Arrow fast path and plans as a JVM LocalTableScan, while
    `createDataFrame(list)` plans as a pickled-RDD scan that round-trips
    through a Python worker on every action (measured 0.28-0.33 s vs
    0.07 s per noop pass on a 6k-row table, and the gap is per-ACTION,
    not per-construction). Columns are built with dtype=object so pandas
    never coerces (an int column with a None would otherwise become
    float64 and corrupt large ids); Spark casts per-column to the
    declared `schema` (DDL string or StructType), same as the list path.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    rows = list(rows)
    if not rows:
        return empty_df(spark, st)
    names = [f.name for f in st.fields]
    pdf = pd.DataFrame(
        {n: pd.Series([r[i] for r in rows], dtype=object) for i, n in enumerate(names)},
        columns=names,
    )
    return spark.createDataFrame(pdf, schema=st)


def ensure_min_parallelism(df: "DataFrame") -> "DataFrame":
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions — typically a small parquet table read as one
    split — so Arrow-batched Python stages (mapInPandas) actually fan out.

    Scale-safe by construction: at real data volumes the scan already has
    far more splits than cores and this is a no-op (no shuffle added); it
    only pays the shuffle when the input is too small for the shuffle to
    matter.
    """
    if df.isStreaming:
        return df  # micro-batch sizing is the trigger's job, and .rdd
        # is undefined on a streaming DataFrame
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def hadoop_fs(spark: "SparkSession", path: str):
    """(FileSystem, Path) for `path` via the Hadoop FileSystem API — the
    one shared accessor behind every store-side exists/delete/marker
    helper, so path handling works identically on local, HDFS and s3a
    stores (an os.path call would silently never see an object store)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p


def hadoop_exists(spark: "SparkSession", path: str) -> bool:
    fs, p = hadoop_fs(spark, path)
    return fs.exists(p)


def hadoop_delete(spark: "SparkSession", path: str) -> None:
    """Recursive delete; a missing path is a no-op."""
    fs, p = hadoop_fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)
