"""Export operators.

Ports of the reference's export tools (SURVEY.md §2.2):
  * record CSV stream  — OccurrenceDAOImpl.writeToRecordWriter
    (dao/OccurrenceDAOImpl.scala:185-300): project requested fields, write
    CSV; `stream_records` exposes the toLocalIterator form for API-style
    consumers (no full collect on the driver).
  * facet export       — export/ExportFacet.scala: distinct values +
    counts of a field.
  * by-facet partitioned export — export/ExportByFacetQuery.scala:71-105:
    one output partition per key via partitionBy (drives dedup/outliers).
  * Darwin Core Archive creator — export/DwCACreator.scala:85-487: per
    data resource, a zip of meta.xml + eml.xml + occurrence.csv.
"""

from __future__ import annotations

import csv
import io
import os
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.sources.dwc_terms import DWC_URI_PREFIXES


def export_csv(df: DataFrame, fields: list[str], path: str) -> None:
    """Projected CSV export; single header, distributed write."""
    df.select(*fields).write.mode("overwrite").option("header", True).csv(path)


def stream_records(df: DataFrame, fields: list[str]) -> Iterator[list]:
    """Streaming record reader (Store.writeToStream shape): iterates rows
    without collecting the whole result on the driver."""
    for row in df.select(*fields).toLocalIterator():
        yield list(row)


def export_facet(df: DataFrame, field: str, path: str, include_counts: bool = True) -> None:
    """ExportFacet: distinct facet values (+counts) for a field."""
    out = df.filter(F.col(field).isNotNull()).groupBy(field)
    result = out.count() if include_counts else out.agg()
    result.orderBy(field).write.mode("overwrite").option("header", True).csv(path)


def export_by_facet(df: DataFrame, facet_field: str, fields: list[str], path: str) -> None:
    """ExportByFacetQuery: per-key output directories via partitionBy —
    replaces the reference's per-key SOLR query loop with one partitioned
    write."""
    df.select(facet_field, *[f for f in fields if f != facet_field]).write.mode(
        "overwrite"
    ).partitionBy(facet_field).option("header", True).csv(path)


_DWCA_META_TEMPLATE = """<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core encoding="UTF-8" fieldsTerminatedBy="," linesTerminatedBy="\\n"
        fieldsEnclosedBy="&quot;" ignoreHeaderLines="1"
        rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
    <files><location>occurrence.csv</location></files>
    <id index="0"/>
{fields}
  </core>
</archive>
"""


def _term_uri(term: str) -> str:
    name = "class" if term == "classs" else term
    return DWC_URI_PREFIXES[0] + name


def create_dwca(
    df: DataFrame,
    fields: list[str],
    zip_path: str,
    eml: str = "<eml/>",
    max_rows: int | None = None,
) -> str:
    """DwCACreator: write one Darwin Core Archive zip for the DataFrame.

    The data rows stream through toLocalIterator (bounded driver memory);
    for per-resource archives at scale, partition the input by
    dataResourceUid first and call this per partition output.
    """
    field_lines = "\n".join(
        f'    <field index="{i + 1}" term="{_term_uri(t)}"/>'
        for i, t in enumerate(fields)
    )
    meta = _DWCA_META_TEMPLATE.format(fields=field_lines)
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    rows = df.select(*fields).toLocalIterator()
    buffer = io.StringIO()
    writer = csv.writer(buffer, lineterminator="\n")
    writer.writerow(["id"] + fields)
    for i, row in enumerate(rows):
        if max_rows is not None and i >= max_rows:
            break
        writer.writerow([i] + ["" if v is None else v for v in row])
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.xml", meta)
        zf.writestr("eml.xml", eml)
        zf.writestr("occurrence.csv", buffer.getvalue())
    return zip_path
