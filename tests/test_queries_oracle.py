"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the exact gate the driver applies for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from biocache_store_spark.queries import load_all
from tests.oracle_harness import run_query_pair

SF_DIR = "/root/testdata/sf0.01"

QUERY_NAMES = sorted(load_all().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    problems = run_query_pair(spark, SF_DIR, name)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_registry_contract(spark):
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10
