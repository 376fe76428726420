"""Runtime utilities."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_FLAG = "spark.biocache.pyfilesShipped"


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
    zip_path = os.path.join(
        tempfile.gettempdir(), "biocache_store_spark_pyfiles.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for name in files:
                    if not name.endswith(".py"):
                        continue
                    full = os.path.join(root, name)
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
