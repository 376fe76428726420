"""Auto DwC CSV loader.

Port of load/AutoDwcCSVLoader.scala: a data resource delivers an archive
(or directory) of `*dwc*.csv*` files in two flavors —
  * data files: records to insert/update (loaded like any DwC CSV);
  * id files (`dwc-id`/`dwcid` in the name): the identifying fields of ALL
    current records; anything absent from them is no longer current and
    must be deleted (AutoDwcCSVLoader.loadAutoFile :129-220 treats them as
    currency markers, extractValidRowKeys :222-289).

Spark shape: glob-discover the files, union the data files through the
standard DwC CSV loader (sources/csv_loader.py), load the id files into a
keys relation, and expose `stale_records` as the anti-join of the existing
store against the id keys — the deletion step becomes a set operation
instead of a per-row Cassandra delete.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.sources.csv_loader import add_record_identity, load_csv, map_headers

# AutoDwcCSVLoader.loadPattern (:76)
LOAD_PATTERN = re.compile(r".*dwc.*\.csv.*")
_ID_MARKERS = ("dwc-id", "dwcid")


def discover_files(directory: str) -> tuple[list[str], list[str]]:
    """Split a directory's contents into (data_files, id_files) per the
    reference's name rules (AutoDwcCSVLoader.scala:154-173)."""
    data_files: list[str] = []
    id_files: list[str] = []
    for name in sorted(os.listdir(directory)):
        if not LOAD_PATTERN.fullmatch(name):
            continue
        path = os.path.join(directory, name)
        if any(marker in name for marker in _ID_MARKERS):
            id_files.append(path)
        else:
            data_files.append(path)
    return data_files, id_files


def load_auto(
    spark: SparkSession,
    directory: str,
    data_resource_uid: str,
    unique_terms: list[str],
    delimiter: str = ",",
) -> tuple[DataFrame | None, DataFrame | None]:
    """Load every matching data file (unioned by name) and the id files as
    a current-keys relation. Returns (records, current_keys); either may be
    None when no matching files exist."""
    data_files, id_files = discover_files(directory)
    records = None
    for path in data_files:
        df = load_csv(spark, path, data_resource_uid, unique_terms, delimiter)
        records = df if records is None else records.unionByName(
            df, allowMissingColumns=True
        )
    current = None
    for path in id_files:
        # SAME parse options as the data files (quote/escape/multiLine):
        # a unique-term value with an embedded quote or newline must mint
        # the identical rowKey on both paths, or the record is wrongly
        # reported stale
        raw = (
            spark.read.option("header", True)
            .option("delimiter", delimiter)
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", True)
            .csv(path)
        )
        keys = add_record_identity(
            map_headers(raw), data_resource_uid, unique_terms
        ).select("rowKey")
        current = keys if current is None else current.unionByName(keys)
    if current is not None:
        current = current.distinct()
    return records, current


def stale_records(
    existing: DataFrame,
    current_keys: DataFrame,
    data_resource_uid: str | None = None,
) -> DataFrame:
    """Records in the store that are absent from the id files — the set the
    reference deletes after an auto load (left anti-join on rowKey).

    Deletion is RESOURCE-SCOPED, as in the reference: when
    `data_resource_uid` is given (or the store carries dataResourceUid),
    only that resource's records are candidates — the id files say
    nothing about other resources, and an unscoped anti-join against a
    shared store would mark every other resource stale."""
    scoped = existing
    if data_resource_uid is not None:
        if "dataResourceUid" in existing.columns:
            scoped = existing.filter(
                F.col("dataResourceUid") == data_resource_uid
            )
        else:
            scoped = existing.filter(
                F.col("rowKey").startswith(data_resource_uid + "|")
            )
    return scoped.join(
        current_keys.withColumnRenamed("rowKey", "__current_key"),
        scoped["rowKey"] == F.col("__current_key"),
        "left_anti",
    )
