"""Adversarial-configuration oracle sweep.

Runs EVERY registered query against its DuckDB oracle under a
deliberately hostile Spark configuration — tiny prime shuffle
partitioning (7) plus a non-UTC session timezone — to flush out the two
classic silent-corruption classes before the driver can find them:

  * partitioning-dependent results (double aggregation order flipping a
    rounded value across partition counts),
  * timezone-dependent timestamp semantics.

The pytest suite runs the same comparisons under the standard local[32]
session; this sweep is the same gate under the adversarial session.
Last full run: 132/132 green in 151 s (round 12).

Usage: python tools/hostile_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.session.timeZone", "Australia/Sydney")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.default.parallelism", "5")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from biocache_store_spark.queries import load_all
    from tests.oracle_harness import run_query_pair

    t0 = time.time()
    failures = []
    for name in sorted(load_all()):
        try:
            problems = run_query_pair(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            problems = [f"EXCEPTION: {exc}"]
        if problems:
            failures.append((name, problems))
            print(f"FAIL {name}: {problems[0]}", flush=True)
    print(f"done in {time.time() - t0:.0f}s; {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
