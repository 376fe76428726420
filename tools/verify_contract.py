"""Verify-skill driver replica: vanilla SparkSession (hostile timezone),
entry() smoke, every queries()[name] vs oracle_sql()[name] at sf0.01.

Usage: python tools/verify_contract.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "Australia/Sydney")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tests.oracle_harness import run_query_pair

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry() OK: {len(rows)} rows")

    names = list(e.queries())
    oracles = e.oracle_sql()
    t0 = time.time()
    failures = []
    for i, name in enumerate(names):
        if name not in oracles:
            continue
        try:
            problems = run_query_pair(spark, "/root/testdata/sf0.01", name)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {exc}"]
        if problems:
            failures.append((name, problems))
            print(f"FAIL {name}: {problems}")
    print(
        f"done: {len(names)} queries, {len(failures)} failures, "
        f"{time.time() - t0:.0f}s"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
