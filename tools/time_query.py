"""Time one registered query in isolation: N noop-sink passes, fresh session.

Usage: python tools/time_query.py <name> [passes]
Prints per-pass seconds and the min.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biocache_store_spark.io import sf_dir  # noqa: E402
from biocache_store_spark.queries import load_all  # noqa: E402
from biocache_store_spark.session import get_spark  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    data_dir = sf_dir()
    spark = get_spark(app_name=f"time-{name}")
    q = load_all()[name]
    # session warmup identical in spirit to bench.py
    from pyspark.sql import functions as F

    from biocache_store_spark.functions.vectors import norm_arrow

    spark.read.parquet(os.path.join(data_dir, "lineitem.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()
    spark.range(1024).select(norm_arrow(F.array(F.lit(1.0))).alias("x")).write.mode(
        "overwrite"
    ).format("noop").save()
    times = []
    for i in range(passes):
        spark.sparkContext.setJobDescription(f"{name} pass {i}")
        t0 = time.perf_counter()
        q.spark_fn(spark, data_dir).write.mode("overwrite").format("noop").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: passes={times} min={min(times)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
