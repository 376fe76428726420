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
import re
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
    nz = df.filter(F.col(field).isNotNull())
    # agg() with zero expressions is rejected by Spark — the counts-free
    # variant is a plain distinct projection
    result = nz.groupBy(field).count() if include_counts else nz.select(field).distinct()
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
  </core>{extension}
</archive>
"""

# the Multimedia extension block the reference's addMetaWithMultimedia
# emits (export/DwCACreator.scala:407-481): image.csv keyed by coreid,
# field 0 doubling as the literal `id` term, fields 1-9 the dcterms
# media descriptors
_DWCA_MULTIMEDIA_ROW_TYPE = "http://rs.gbif.org/terms/1.0/Multimedia"
DWCA_MULTIMEDIA_FIELDS = [
    "identifier", "creator", "created", "title", "format",
    "license", "rights", "rightsHolder", "references",
]
_DWCA_MULTIMEDIA_TEMPLATE = """
  <extension encoding="UTF-8" fieldsTerminatedBy="," linesTerminatedBy="\\n"
        fieldsEnclosedBy="&quot;" ignoreHeaderLines="1"
        rowType="{row_type}">
    <files><location>image.csv</location></files>
    <coreid index="0"/>
    <field index="0" term="id"/>
{fields}
  </extension>"""


# Dublin Core terms that appear in occurrence archives: these live in the
# dcterms namespace, NOT dwc — declaring them under dwc/terms/ produces
# URIs that don't exist and IPT/validators reject (the reference's
# DwCACreator emits the dcterms URIs)
_DCTERMS = frozenset(
    {
        "accessRights", "bibliographicCitation", "language", "license",
        "modified", "references", "rights", "rightsHolder", "source", "type",
        # the Multimedia extension descriptors (DwCACreator.scala:461-470)
        "identifier", "creator", "created", "title", "format",
    }
)


def _term_uri(term: str) -> str:
    name = "class" if term == "classs" else term
    if name in _DCTERMS:
        return DWC_URI_PREFIXES[1] + name
    return DWC_URI_PREFIXES[0] + name


def create_dwca(
    df: DataFrame,
    fields: list[str],
    zip_path: str,
    eml: str = "<eml/>",
    max_rows: int | None = None,
    multimedia: DataFrame | None = None,
    core_id_col: str | None = None,
) -> str:
    """DwCACreator: write one Darwin Core Archive zip for the DataFrame.

    The data rows stream through toLocalIterator (bounded driver memory);
    for per-resource archives at scale, partition the input by
    dataResourceUid first and call this per partition output.

    With `multimedia`, the archive additionally carries the GBIF
    Multimedia extension the reference's addMetaWithMultimedia /
    addImageExportsToArchives pair emits (export/DwCACreator.scala:
    407-494): an `image.csv` keyed by the core id plus the extension
    block in meta.xml. `multimedia` rows need `core_id_col` (linking
    them to core records) plus any subset of DWCA_MULTIMEDIA_FIELDS —
    absent descriptors are written empty. `core_id_col` names the field
    written as the core id column (the reference's uuid-at-index-0
    convention); a media-bearing archive requires it so extension rows
    can actually resolve. Without it the id column falls back to the
    row index (the legacy media-less layout).
    """
    if multimedia is not None and core_id_col is None:
        raise ValueError(
            "create_dwca: multimedia rows need core_id_col so image.csv "
            "can link to core records (row-index ids are not stable keys)"
        )
    if core_id_col is not None and core_id_col not in df.columns:
        raise ValueError(
            f"create_dwca: core_id_col {core_id_col!r} not in the DataFrame"
        )
    # validate the media side BEFORE any byte is written: failing on the
    # media select after occurrence.csv streamed would leave a finalized
    # zip whose meta.xml declares an image.csv that does not exist
    if multimedia is not None and core_id_col not in multimedia.columns:
        raise ValueError(
            f"create_dwca: core_id_col {core_id_col!r} not in the "
            f"multimedia DataFrame (columns: {multimedia.columns}) — "
            "rename the media id column to match the core id field"
        )
    field_lines = "\n".join(
        f'    <field index="{i + 1}" term="{_term_uri(t)}"/>'
        for i, t in enumerate(fields)
    )
    extension = ""
    if multimedia is not None:
        ext_lines = "\n".join(
            f'    <field index="{i + 1}" term="{_term_uri(t)}"/>'
            for i, t in enumerate(DWCA_MULTIMEDIA_FIELDS)
        )
        extension = _DWCA_MULTIMEDIA_TEMPLATE.format(
            row_type=_DWCA_MULTIMEDIA_ROW_TYPE, fields=ext_lines
        )
    meta = _DWCA_META_TEMPLATE.format(fields=field_lines, extension=extension)
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    id_cols = [core_id_col] if core_id_col is not None else []
    rows = df.select(*id_cols, *fields).toLocalIterator()
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.xml", meta)
        zf.writestr("eml.xml", eml)
        # stream the occurrence CSV straight into the zip entry: with
        # toLocalIterator this keeps driver memory flat however large the
        # export — buffering the CSV in a StringIO held TWO full copies
        with zf.open("occurrence.csv", mode="w") as entry:
            text = io.TextIOWrapper(entry, encoding="utf-8", newline="")
            writer = csv.writer(text, lineterminator="\n")
            writer.writerow(["id"] + fields)
            for i, row in enumerate(rows):
                if max_rows is not None and i >= max_rows:
                    break
                vals = ["" if v is None else v for v in row]
                if core_id_col is None:
                    vals = [i] + vals
                writer.writerow(vals)
            text.flush()
            text.detach()
        if multimedia is not None:
            media_cols = [
                F.col(core_id_col).cast("string"),
                *[
                    (
                        F.col(t).cast("string")
                        if t in multimedia.columns
                        else F.lit(None).cast("string")
                    )
                    for t in DWCA_MULTIMEDIA_FIELDS
                ],
            ]
            media_rows = multimedia.select(*media_cols).toLocalIterator()
            with zf.open("image.csv", mode="w") as entry:
                text = io.TextIOWrapper(entry, encoding="utf-8", newline="")
                writer = csv.writer(text, lineterminator="\n")
                writer.writerow(["id"] + DWCA_MULTIMEDIA_FIELDS)
                for row in media_rows:
                    writer.writerow(["" if v is None else v for v in row])
                text.flush()
                text.detach()
    return zip_path


_DWCA_EVENT_META_TEMPLATE = """<archive xmlns="http://rs.tdwg.org/dwc/text/">
  <core encoding="UTF-8" fieldsTerminatedBy="," linesTerminatedBy="\\n"
        fieldsEnclosedBy="&quot;" ignoreHeaderLines="1"
        rowType="http://rs.tdwg.org/dwc/terms/Event">
    <files><location>event.csv</location></files>
    <id index="0"/>
{event_fields}
  </core>
  <extension encoding="UTF-8" fieldsTerminatedBy="," linesTerminatedBy="\\n"
        fieldsEnclosedBy="&quot;" ignoreHeaderLines="1"
        rowType="http://rs.tdwg.org/dwc/terms/Occurrence">
    <files><location>occurrence.csv</location></files>
    <coreid index="0"/>
{occurrence_fields}
  </extension>
</archive>
"""


def create_event_dwca(
    events: DataFrame,
    event_fields: list[str],
    occurrences: DataFrame,
    occurrence_fields: list[str],
    zip_path: str,
    event_id_col: str,
    core_id_col: str,
    eml: str = "<eml/>",
) -> str:
    """Write a GBIF sampling-event Darwin Core Archive zip: an Event core
    (`event.csv`, `<id index=0>`) plus an Occurrence extension
    (`occurrence.csv`, `<coreid index=0>` linking each occurrence to its
    parent event). This is the publishing shape the reference LOADS via
    EventCoreExtractor (load/DwCALoader.scala:522-600) — the creator side
    exists here so event-core round trips can be fixture-generated and
    tested without an external IPT.

    `event_id_col` names the events column written as the core id;
    `core_id_col` names the occurrences column written as the coreid.
    Both data files stream through toLocalIterator (bounded driver
    memory), like create_dwca.
    """
    for col, df, side in (
        (event_id_col, events, "events"),
        (core_id_col, occurrences, "occurrences"),
    ):
        if col not in df.columns:
            raise ValueError(
                f"create_event_dwca: id column {col!r} not in the {side} "
                f"DataFrame (columns: {df.columns})"
            )
    meta = _DWCA_EVENT_META_TEMPLATE.format(
        event_fields="\n".join(
            f'    <field index="{i + 1}" term="{_term_uri(t)}"/>'
            for i, t in enumerate(event_fields)
        ),
        occurrence_fields="\n".join(
            f'    <field index="{i + 1}" term="{_term_uri(t)}"/>'
            for i, t in enumerate(occurrence_fields)
        ),
    )
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.xml", meta)
        zf.writestr("eml.xml", eml)
        for name, df, id_col, fields in (
            ("event.csv", events, event_id_col, event_fields),
            ("occurrence.csv", occurrences, core_id_col, occurrence_fields),
        ):
            rows = df.select(id_col, *fields).toLocalIterator()
            with zf.open(name, mode="w") as entry:
                text = io.TextIOWrapper(entry, encoding="utf-8", newline="")
                writer = csv.writer(text, lineterminator="\n")
                writer.writerow(["id"] + fields)
                for row in rows:
                    writer.writerow(["" if v is None else v for v in row])
                text.flush()
                text.detach()
    return zip_path


# ExportAllSpatialSpecies.scala:63-90 — the per-species spatial dump columns
# (point ladder + el layer samples + dedup keys), sanitized names
ALL_SPATIAL_SPECIES_FIELDS = [
    "id", "species_guid", "subspecies_guid", "year", "month",
    "occurrence_date", "point_1", "point_0_1", "point_0_01", "point_0_001",
    "point_0_0001", "lat_long", "raw_taxon_name", "collectors",
    "duplicate_status", "duplicate_record", "latitude", "longitude",
    "el882", "el889", "el887", "el865", "el894",
    "coordinate_uncertainty", "record_number", "catalogue_number",
]


def export_all_spatial_species(
    index_df: DataFrame,
    path: str,
    fields: list[str] | None = None,
    species_col: str = "species_guid",
    subspecies_col: str = "subspecies_guid",
) -> None:
    """ExportAllSpatialSpecies (export/ExportAllSpatialSpecies.scala:100-186):
    the per-species spatial dump feeding duplicate detection and the
    jackknife outlier pipeline.

    The reference loops a SOLR query per species guid over N threads and
    hand-assigns writers; here it is ONE job: filter to georeferenced rows
    (`lat_long:*`), repartition by species so each species' records are
    co-located, sort within partitions, and write TSV partitioned under
    species/ and subspecies/ — the downstream group-iteration contract
    (ReverseJacknifeProcessor.scala:279-313 reads sorted runs) holds
    per-partition without any driver-side loop."""
    fields = fields or ALL_SPATIAL_SPECIES_FIELDS
    present = [f for f in fields if f in index_df.columns]
    base = index_df.filter(F.col("lat_long").isNotNull()).select(
        *[F.col(f).cast("string") for f in present]
    )
    _write_sharded_tsv(
        base.filter(F.col(species_col).isNotNull()),
        species_col,
        [species_col],
        os.path.join(path, "species"),
    )
    if subspecies_col in index_df.columns:
        _write_sharded_tsv(
            base.filter(F.col(subspecies_col).isNotNull()),
            subspecies_col,
            [subspecies_col],
            os.path.join(path, "subspecies"),
        )


def _write_sharded_tsv(
    df: DataFrame, part_col: str, sort_cols: list[str], path: str
) -> None:
    """The spatial-dump write contract shared by the species/subspecies
    exports: shards co-located on `part_col` (the reference's N thread
    files), sorted runs within each shard (the downstream group-iteration
    contract), headered TSV."""
    (
        df.repartition(F.col(part_col))
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .option("header", True)
        .option("delimiter", "\t")
        .csv(path)
    )


def export_all_records_facet_filter(
    index_df: DataFrame,
    path: str,
    facet_field: str = "species_guid",
    fields: list[str] | None = None,
    filter_expr: str | None = None,
    min_count: int = 2,
    subspecies_col: str = "subspecies_guid",
) -> None:
    """ExportAllRecordFacetFilter (export/ExportAllRecordFacetFilter
    .scala:17-86): the facet-driven dump variant with an optional filter
    and a per-facet-value minimum count — the reference facets the field
    (optionally under -fq), feeds values through a CountAwareFacetConsumer
    that only dumps values with >= 2 occurrences, then downloads each
    value's GEOREFERENCED records (fq lat_long:[* TO *]) sorted by
    (facet, subspecies, row_key) into N thread files plus a subspecies
    side file. The count gate precedes the georeference filter exactly
    as in the reference: a value with 2 records of which 1 has
    coordinates passes the gate and dumps its 1 georeferenced row.

    Spark shape: ONE job — the filter is a Catalyst predicate pushed to
    the scan, the min-count gate is a groupBy count (map-side combined)
    semi-joined back (value-count-sized, so AQE picks broadcast at
    runtime; no forced broadcast — a pathological near-unique facet must
    degrade to a shuffle join, not a driver OOM), and the thread shards
    fall out of _write_sharded_tsv, the same contract as
    export_all_spatial_species."""
    fields = fields or ALL_SPATIAL_SPECIES_FIELDS
    base = index_df
    if filter_expr is not None:
        base = base.filter(filter_expr)
    base = base.filter(F.col(facet_field).isNotNull())
    qualifying = (
        base.groupBy(facet_field)
        .count()
        .filter(F.col("count") >= min_count)
        .select(facet_field)
    )
    geo = base.filter(F.col("lat_long").isNotNull())
    present = [f for f in fields if f in geo.columns]
    if facet_field not in present:
        # the shards are partitioned and sorted on the facet — a custom
        # fields list cannot drop it from the projection
        present = [facet_field] + present
    gated = geo.join(qualifying, facet_field, "left_semi").select(
        *[F.col(f).cast("string") for f in present]
    )
    # full reference sort key: (facet, subspecies, row_key) — the row key
    # ('id' in the index schema) breaks ties so within-shard order is
    # deterministic, matching the download's sort=<facet> asc,<sub> asc,
    # row_key asc (ExportAllRecordFacetFilter.scala:75-80)
    # gate on `present` (the columns gated actually carries), not on the
    # source frame: a custom `fields` list without the subspecies column
    # must skip the subspecies sort/side-file, not reference a column
    # the projection dropped
    row_key = ["id"] if "id" in present else []
    has_sub = subspecies_col in present
    sort_keys = (
        [facet_field] + ([subspecies_col] if has_sub else []) + row_key
    )
    _write_sharded_tsv(
        gated, facet_field, sort_keys, os.path.join(path, "species")
    )
    if has_sub:
        _write_sharded_tsv(
            gated.filter(F.col(subspecies_col).isNotNull()),
            subspecies_col,
            [subspecies_col] + row_key,
            os.path.join(path, "subspecies"),
        )


def export_avro(df: DataFrame, path: str, fields: list[str] | None = None) -> bool:
    """Avro export (util/AvroUtil.scala:15-100 semantics: the flat index
    row as an Avro record). Spark's avro support is an external module
    (org.apache.spark.sql.avro); when the jar is not on the classpath the
    export degrades to parquet alongside a clear warning and returns False
    (import-gated, per the environment's no-install rule)."""
    out = df.select(*fields) if fields else df
    try:
        out.write.mode("overwrite").format("avro").save(path)
        return True
    except Exception as e:  # noqa: BLE001 - AnalysisException w/o avro jar
        # gate on the MISSING-DATA-SOURCE error class, not an 'avro'
        # substring: real write failures embed the output path in their
        # message (which callers typically name .../avro/...) and must
        # not be swallowed into a silent parquet downgrade
        msg = str(e)
        missing_source = (
            "FAILED_TO_FIND_DATA_SOURCE" in msg
            or "Failed to find data source" in msg
            or "ClassNotFoundException" in msg
        )
        if not missing_source:
            raise
        out.write.mode("overwrite").parquet(path)
        return False


_EL_CL_RE = re.compile(r"^(el|cl)[0-9]+$")


def export_local_node(
    df: DataFrame,
    path: str,
    fields: list[str],
    key_col: str = "rowKey",
    separator: str = "\t",
    quote: str = "|",
    escape: str = "$",
) -> None:
    """Local-node sorted export (util/ExportLocalNode.scala:32-105): dump
    the requested fields sorted by row key, resolving elNNN/clNNN fields
    out of the sampled-layer map columns (the reference parses the el_p /
    cl_p JSON per row; here it's a map getItem projection).

    The reference pages the LOCAL Cassandra token ranges on one node; the
    Spark analogue is sortWithinPartitions — each output partition is a
    sorted run, no global shuffle, which preserves the tool's contract
    (per-node sorted files) at any scale."""
    cols = []
    for f in fields:
        m = _EL_CL_RE.fullmatch(f)
        if m and f not in df.columns:
            layer_map = m.group(1) + "_p"
            if layer_map in df.columns:
                cols.append(
                    F.col(layer_map).getItem(f).cast("string").alias(f)
                )
                continue
        cols.append(F.col(f).cast("string").alias(f))
    (
        df.select(F.col(key_col).cast("string").alias(key_col), *cols)
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .option("header", True)
        .option("delimiter", separator)
        .option("quote", quote)
        .option("escape", escape)
        .csv(path)
    )


def write_occurrence_store(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("dataResourceUid",),
    target_file_rows: int | None = None,
) -> None:
    """The persisted occurrence-store layout for the 100 TB deployment:
    parquet partitioned by data resource (the reference's natural unit of
    ingest, reprocessing, and deletion — every maintenance op in
    tool/ProcessRecords.scala / DataLoader.scala is resource-scoped), so
    per-resource reprocessing and delete-by-resource become partition
    operations instead of full scans, and resource-scoped reads prune at
    the directory level.

    `target_file_rows` bounds rows per output file (giant-file guard) via
    Spark's maxRecordsPerFile; small-file pressure is the caller's
    repartition decision."""
    writer = df.write.mode("overwrite")
    if target_file_rows is not None:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    writer.partitionBy(*partition_by).parquet(path)


def write_bucketed_store(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) parquet table — the co-located-join layout.

    The reference co-locates raw and processed column families in one
    Cassandra wide row, so its raw<->processed comparison
    (Store.scala getComparison path) and processed-batch upsert never
    reshuffle data. The Spark-native equivalent is bucketing: write every
    relation that joins on the same key (`rowKey`: raw store, processed
    store, assertions, dellog) with the same `bucket_cols` and
    `num_buckets`, and Catalyst plans those joins with ZERO Exchange —
    each task reads matching bucket files from both sides. With
    `sort_cols` the sort-merge join also skips its per-task sort.

    At 100 TB this is the difference between shuffling the full store on
    every reprocess/compare cycle and a purely local merge; the bucket
    count is fixed at write time, so pick it for the target cluster
    (buckets >= max parallelism you want on the join).

    Bucketing requires a catalog table (`saveAsTable`); `path` makes it an
    external table so the files live in the caller's store layout.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def export_jsonl(df: DataFrame, path: str, fields: list[str] | None = None) -> None:
    """JSONL corpus export — the write half of sources/jsonl.py
    load_jsonl, so a curated documents store round-trips losslessly
    through the interchange format every downstream training stack
    reads. Distributed JSON-lines write (one object per line, text
    compression left to the caller's Spark conf)."""
    if fields:
        df = df.select(*fields)
    df.write.mode("overwrite").json(path)
