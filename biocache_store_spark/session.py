"""SparkSession factory tuned for this engine.

The reference hand-rolls its parallelism (token-range scans over Cassandra,
fixed thread pools, bounded queues -- Cassandra3PersistenceManager.scala:758-1010,
IndexRunner.scala:121). In Spark all of that is partitioning + AQE; the only
job of this module is to pick sane defaults for the local[32] test harness
while keeping every setting one a 1000-executor cluster would also want.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "biocache-store-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow the driver contract: local[$SPARK_GRAFT_CPUS] with 32
    shuffle partitions, AQE on (skew handling replaces the reference's
    cassandraTokenSplit sub-splitting), Arrow enabled for the pandas-UDF
    operators (jackknife, grouped dedup).
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Spark 4 implements lower()/upper() under UTF8_BINARY via the ICU
        # library; ICU's case-mapping path allocates heavily and serializes
        # on a shared BreakIterator cache, which turns any 32-task stage
        # with lower() in the hot loop into a lock convoy (thread dumps:
        # CollationSupport$Lower.execBinaryICU dominating RUNNABLE samples,
        # 10-30x wall-clock variance). JVM case mappings are bit-identical
        # for ASCII and match the DuckDB oracles on this corpus.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
