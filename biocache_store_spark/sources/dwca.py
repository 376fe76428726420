"""Darwin Core Archive loader.

Port of load/DwCALoader.scala:174-363: an extracted DwC-A directory holds
`meta.xml` describing a star schema — a core file (occurrence or event) and
extension files keyed by coreid — with per-file delimiters, header lines and
term-URI column mappings. The loader parses meta.xml (driver-side; it is a
small descriptor), reads each data file with spark.read.csv using the
declared geometry, names columns by their mapped DwC terms, and star-joins
extensions onto the core (the reference's EventCore/OccurrenceCore
extractors' fan-out becomes a plain join).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.sources.csv_loader import add_record_identity
from biocache_store_spark.sources.dwc_terms import match_term

_NS = "{http://rs.tdwg.org/dwc/text/}"


@dataclass
class FileDescriptor:
    row_type: str
    location: str
    delimiter: str = ","
    quote: str = '"'
    escape: str | None = None  # fieldsEscapedBy; None = escape-by-doubled-quote
    ignore_header_lines: int = 0
    encoding: str = "UTF-8"
    id_index: int | None = None  # core: <id index>; extension: <coreid index>
    fields: dict[int, str] = field(default_factory=dict)  # column index -> term
    # DwC-text default values (the gbif dwca-io reader the reference uses
    # supplies these automatically): term -> constant for index-less
    # fields; term -> fallback for indexed fields whose value is missing
    defaults: dict[str, str] = field(default_factory=dict)
    field_defaults: dict[str, str] = field(default_factory=dict)


def _decode_delim(s: str | None) -> str:
    if not s:
        return ","
    return s.encode().decode("unicode_escape")


def _parse_file_element(el) -> FileDescriptor:
    files = el.find(f"{_NS}files")
    location = files.find(f"{_NS}location").text.strip()
    # fieldsEnclosedBy: ABSENT means the default double quote, but an
    # EXPLICIT empty string means "no enclosure" (the DwC-text spec's
    # convention, standard for GBIF TSV archives) — coercing "" back to
    # '"' would let a stray inch-mark in the data swallow rows
    enclosed = el.get("fieldsEnclosedBy")
    quote = '"' if enclosed is None else enclosed
    escaped = el.get("fieldsEscapedBy")
    fd = FileDescriptor(
        row_type=el.get("rowType", ""),
        location=location,
        delimiter=_decode_delim(el.get("fieldsTerminatedBy")),
        quote=quote,
        escape=_decode_delim(escaped) if escaped else None,
        ignore_header_lines=int(el.get("ignoreHeaderLines", "0")),
        encoding=el.get("encoding") or "UTF-8",
    )
    id_el = el.find(f"{_NS}id")
    if id_el is None:
        id_el = el.find(f"{_NS}coreid")
    if id_el is not None:
        fd.id_index = int(id_el.get("index"))
    for field_el in el.findall(f"{_NS}field"):
        idx = field_el.get("index")
        term_uri = field_el.get("term", "")
        term = match_term(term_uri) or term_uri.rsplit("/", 1)[-1]
        default = field_el.get("default")
        if idx is None:
            # index-less field: a CONSTANT column (IPT emits these for
            # archive-wide values like institutionCode)
            if default is not None:
                fd.defaults[term] = default
            continue
        fd.fields[int(idx)] = term
        if default is not None:
            # indexed field with a default: the value falls back to it
            # when the cell is missing (DwC-text spec)
            fd.field_defaults[term] = default
    return fd


@dataclass
class ArchiveDescriptor:
    core: FileDescriptor
    extensions: list[FileDescriptor]


def parse_meta(archive_dir: str) -> ArchiveDescriptor:
    tree = ET.parse(os.path.join(archive_dir, "meta.xml"))
    root = tree.getroot()
    core = _parse_file_element(root.find(f"{_NS}core"))
    extensions = [
        _parse_file_element(el) for el in root.findall(f"{_NS}extension")
    ]
    return ArchiveDescriptor(core=core, extensions=extensions)


def _read_file(
    spark: SparkSession, archive_dir: str, fd: FileDescriptor, id_alias: str
) -> DataFrame:
    path = os.path.join(archive_dir, fd.location)
    # ignoreHeaderLines > 1 (preamble + header, allowed by the spec):
    # Spark's header option skips exactly one line, so strip the extra
    # leading lines into a local copy first — archives are already local
    # extracted files, and this runs once per load. The copy lives OUTSIDE
    # the archive dir (so directory-glob readers never pick it up as data)
    # and is regenerated whenever the source file is newer (so
    # re-extracting an updated archive over the same path can't serve a
    # stale copy).
    if fd.ignore_header_lines > 1:
        import hashlib
        import tempfile

        cache_dir = os.path.join(tempfile.gettempdir(), "biocache_dwca_strip")
        os.makedirs(cache_dir, exist_ok=True)
        # the key folds in the DECLARED ENCODING: a meta.xml-only encoding
        # fix (data file untouched, mtime unchanged) must not re-serve a
        # copy transcoded under the old declaration
        digest = hashlib.md5(
            f"{os.path.abspath(path)}|{fd.encoding}".encode()
        ).hexdigest()
        stripped = os.path.join(
            cache_dir, f"{digest}.skip{fd.ignore_header_lines - 1}"
        )
        if (
            not os.path.exists(stripped)
            or os.path.getmtime(stripped) < os.path.getmtime(path)
        ):
            # write via temp + atomic rename: a crashed or concurrent
            # writer must never leave a truncated copy that the mtime
            # check would then consider valid forever
            tmp_fd, tmp_path = tempfile.mkstemp(dir=cache_dir, suffix=".part")
            try:
                # errors="replace" on BOTH ends: the decode can produce
                # U+FFFD, which charsets like cp1252 cannot encode — a
                # strict dst would crash the whole load on one bad byte
                with open(
                    path, encoding=fd.encoding, errors="replace"
                ) as src, open(
                    tmp_fd, "w", encoding=fd.encoding, errors="replace"
                ) as dst:
                    for _ in range(fd.ignore_header_lines - 1):
                        src.readline()
                    for line in src:
                        dst.write(line)
                os.replace(tmp_path, stripped)
            except BaseException:
                if os.path.exists(tmp_path):
                    os.unlink(tmp_path)
                raise
        path = stripped
    reader = (
        spark.read.option("header", fd.ignore_header_lines > 0)
        .option("delimiter", fd.delimiter)
        # meta.xml's declared file encoding (IPT emits ISO-8859-1
        # archives); Spark decodes per-file, no transcoding copy needed
        .option("encoding", fd.encoding)
    )
    if fd.quote == "":
        # explicit no-enclosure: empty quote option = quoting disabled
        # (the documented Spark CSV convention)
        reader = reader.option("quote", "")
    else:
        # multiLine: quoted fields may legally contain newlines (IPT
        # emits them); the default line-splitting reader would shear such
        # records into misaligned rows. Costs input-split parallelism on
        # the one archive file — archives are loaded once, correctness
        # wins. The escape defaults to the quote char (the doubled-quote
        # convention) unless meta.xml declares fieldsEscapedBy.
        reader = (
            reader.option("quote", fd.quote)
            .option("escape", fd.escape or fd.quote)
            .option("multiLine", True)
        )
    df = reader.csv(path)
    # positional selection: meta.xml indexes are authoritative, headers
    # not — and header CONTENT can be arbitrary (dotted names, URIs), so
    # address columns with df[name] indexing, never F.col() parsing
    cols = []
    seen = set()
    raw_cols = df.columns
    if fd.id_index is not None and fd.id_index < len(raw_cols):
        cols.append(df[raw_cols[fd.id_index]].alias(id_alias))
        seen.add(id_alias)
    for idx, term in sorted(fd.fields.items()):
        if idx < len(raw_cols) and term not in seen:
            col = df[raw_cols[idx]]
            if term in fd.field_defaults:
                # dwca-io treats EMPTY as unsupplied too, not just null
                col = F.coalesce(
                    F.nullif(col, F.lit("")),
                    F.lit(fd.field_defaults[term]),
                )
            cols.append(col.alias(term))
            seen.add(term)
    out = df.select(*cols)
    # index-less default fields become constant columns, and an indexed
    # field whose declared index exceeds the file's column count
    # (ragged/truncated archive) still gets its default — dwca-io
    # supplies it for every row either way
    for term, value in {**fd.field_defaults, **fd.defaults}.items():
        if term not in seen:
            out = out.withColumn(term, F.lit(value))
            seen.add(term)
    return out


def resolve_multimedia_locations(
    df: DataFrame, archive_dir: str, column: str = "multimedia"
) -> DataFrame:
    """DwCALoader.locateMultimedia parity (load/DwCALoader.scala, tested
    by DwCALoaderTest 'locate multimedia 1-3'): a Multimedia extension
    row's identifier is either an ABSOLUTE URL or a bare filename
    RELATIVE to the archive — media shipped inside the DwC-A zip. Adds a
    `location` field to every multimedia struct: absolute identifiers
    (any scheme, query strings preserved) pass through verbatim,
    relative ones resolve to a file:// URL under the archive directory,
    NULL identifiers get a NULL location. One array transform, no UDF."""
    base = "file://" + os.path.abspath(archive_dir) + "/"
    scheme = r"^[A-Za-z][A-Za-z0-9+.-]*://"

    def locate(m):
        ident = m["identifier"]
        loc = F.when(ident.rlike(scheme), ident).otherwise(
            F.concat(F.lit(base), ident)
        )
        return m.withField("location", loc)

    return df.withColumn(column, F.transform(F.col(column), locate))


def _simple_row_type(row_type: str) -> str:
    """'http://rs.tdwg.org/dwc/terms/Occurrence' -> 'occurrence'."""
    return row_type.rstrip("/").rsplit("/", 1)[-1].lower()


def _blank_to_null(c):
    # StringUtils.isNotBlank parity: whitespace-only == absent. The
    # ORIGINAL (untrimmed) value is preserved when non-blank — the
    # reference's guard only decides presence, it never rewrites the
    # stored property.
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def _load_event_core(
    spark: SparkSession, archive_dir: str, desc: ArchiveDescriptor
) -> DataFrame:
    """Event-core archive -> occurrence rows inheriting parent event terms.

    EventCoreExtractor parity (load/DwCALoader.scala:522-600; extractor
    choice :194-197): when meta.xml declares an Event core, the OUTPUT
    records are the Occurrence-EXTENSION rows, star-joined back to their
    parent event, with the event's terms appended to each record. The
    reference appends eventTuples after recordTuples and converts with
    `.toMap` (last wins), and blank values are never added
    (StringUtils.isNotBlank guard, DwCALoader.scala:555-565) — so on a
    term both sides declare, a NON-BLANK event value overrides the
    occurrence value, a blank one falls back to the occurrence value, and
    blank-on-both means absent (NULL). Events without occurrence rows
    emit nothing, and occurrence rows whose coreid matches no event are
    never visited by the star iteration — hence the inner join.

    Multimedia and other extensions are NOT loaded for event cores,
    matching the reference's core-rowType gate (DwCALoader.scala:287-295
    only loads multimedia when the core is Occurrence/SimpleDarwinRecord).
    """
    occ_fd = next(
        (
            e
            for e in desc.extensions
            if _simple_row_type(e.row_type) == "occurrence"
        ),
        None,
    )
    if occ_fd is None:
        raise ValueError(
            "load_archive: event-core archive has no Occurrence extension "
            "— there are no occurrence records to load "
            f"(extensions: {[e.row_type for e in desc.extensions]})"
        )
    event = _read_file(spark, archive_dir, desc.core, "coreID")
    occ = _read_file(spark, archive_dir, occ_fd, "coreID")
    occ_terms = [c for c in occ.columns if c != "coreID"]
    event_terms = [c for c in event.columns if c != "coreID"]
    overlap = set(occ_terms) & set(event_terms)
    # prefix event columns so the join never has ambiguous names
    event = event.select(
        "coreID", *[event[c].alias(f"__event_{c}") for c in event_terms]
    )
    joined = occ.join(event, "coreID", "inner")
    # the isNotBlank guard applies to EVERY term, not just conflicting
    # ones: the reference never adds a blank property to the record map,
    # so whitespace-only values load as absent (NULL) on both sides
    cols = [F.col("coreID")]
    for c in occ_terms:
        if c in overlap:
            cols.append(
                F.coalesce(
                    _blank_to_null(F.col(f"__event_{c}")),
                    _blank_to_null(F.col(c)),
                ).alias(c)
            )
        else:
            cols.append(_blank_to_null(F.col(c)).alias(c))
    cols.extend(
        _blank_to_null(F.col(f"__event_{c}")).alias(c)
        for c in event_terms
        if c not in overlap
    )
    return joined.select(*cols)


def load_archive(
    spark: SparkSession,
    archive_dir: str,
    data_resource_uid: str,
    unique_terms: list[str] | None = None,
    collect_extensions: bool = True,
) -> DataFrame:
    """Extracted DwC-A directory -> occurrence DataFrame with identity.

    Occurrence-core archives: extension rows (e.g. multimedia) are
    aggregated per core record into array<struct> columns named by the
    extension row type's simple name — the fan-out join the reference does
    row-by-row (DwCALoader.scala:611-648).

    Event-core archives (meta.xml core rowType = Event): the Occurrence
    extension is the fact side — each extension row becomes one occurrence
    record inheriting (and on conflict being overridden by) its parent
    event's non-blank terms, per EventCoreExtractor
    (load/DwCALoader.scala:522-600). Other extensions are skipped for
    event cores, matching the reference's core-rowType multimedia gate.
    """
    desc = parse_meta(archive_dir)
    if _simple_row_type(desc.core.row_type) == "event":
        core = _load_event_core(spark, archive_dir, desc)
        if unique_terms is None:
            # NO coreID fallback here: coreID is the parent EVENT id,
            # shared by every occurrence fanned out of that event —
            # minting identity from it would give sibling records the
            # same rowKey/uuid and the store upsert would silently
            # collapse them
            if "occurrenceID" not in core.columns:
                raise ValueError(
                    "load_archive: event-core archive's Occurrence "
                    "extension declares no occurrenceID — pass "
                    "unique_terms naming columns that identify one "
                    "occurrence row (the event id alone does not)"
                )
            unique_terms = ["occurrenceID"]
        missing = [t for t in unique_terms if t not in core.columns]
        if missing:
            raise ValueError(
                f"load_archive: identity terms {missing} not present in the "
                "event-core star schema — pass unique_terms naming columns "
                "the occurrence extension or event core has"
            )
        return add_record_identity(core, data_resource_uid, unique_terms)
    core = _read_file(spark, archive_dir, desc.core, "coreID")
    if collect_extensions:
        for ext in desc.extensions:
            ext_df = _read_file(spark, archive_dir, ext, "coreID")
            name = ext.row_type.rstrip("/").rsplit("/", 1)[-1].lower() or "extension"
            value_cols = [c for c in ext_df.columns if c != "coreID"]
            grouped = ext_df.groupBy("coreID").agg(
                F.collect_list(F.struct(*value_cols)).alias(name)
            )
            core = core.join(grouped, "coreID", "left")
    if unique_terms is None:
        unique_terms = ["occurrenceID"] if "occurrenceID" in core.columns else ["coreID"]
    missing = [t for t in unique_terms if t not in core.columns]
    if missing:
        raise ValueError(
            f"load_archive: identity terms {missing} not present in the "
            "core (the archive's meta.xml declares no <id> and no such "
            "fields) — pass unique_terms naming columns the core has"
        )
    return add_record_identity(core, data_resource_uid, unique_terms)
