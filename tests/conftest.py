from __future__ import annotations

import pytest

from biocache_store_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="biocache-store-spark-tests", cpus=8)
    yield spark
    spark.stop()
