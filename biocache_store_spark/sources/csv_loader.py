"""DwC CSV/TSV loader with header mapping and key minting.

Port of load/DwcCSVLoader.scala:158-343: read a delimited file with DwC
headers, map headers to canonical terms, attach the data resource uid, and
mint the record identity: rowkey = dr|uniqueTerm1|uniqueTerm2... (
dao/OccurrenceDAOImpl.scala:163 createUniqueID) plus a deterministic UUIDv5
over that key — replacing the occ_uuid read-or-mint side table
(OccurrenceDAOImpl.scala:142 createOrRetrieveUuid) with a pure function, so
re-loading the same record yields the same uuid with no coordination.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocache_store_spark.sources.dwc_terms import match_term

# fixed namespace for uuid5 minting (generated once for this engine)
UUID_NAMESPACE = uuid.UUID("5d1a6d40-7b21-5a68-9c4f-2f3a8e1b6c77")


def mint_uuid(unique_key: str) -> str:
    return str(uuid.uuid5(UUID_NAMESPACE, unique_key))


def map_headers(df: DataFrame, strict: bool = False) -> DataFrame:
    """Rename recognisable DwC headers to canonical terms; unmatched columns
    are kept as-is (strict=False) or dropped (strict=True).

    Two passes so a term is never claimed twice: headers that ARE a
    canonical term (after normalization) claim it first, then variant
    headers ('id' -> occurrenceID in a file that also carries an
    occurrenceID column — the standard DwC-A export shape) claim only
    still-unclaimed terms. A variant whose term is already claimed keeps
    its original name unless that name is itself a claimed term (the
    duplicate-output-name trap) — then it is dropped."""
    term_of = {col: match_term(col) for col in df.columns}
    claimed: set[str] = set()
    # pass 1: exact canonical headers win their term
    for col in df.columns:
        if term_of[col] == col or (term_of[col] is not None and col.lower() == term_of[col].lower()):
            claimed.add(term_of[col])
    keep = []
    out_names: set[str] = set()
    for col in df.columns:
        term = term_of[col]
        if term is not None and (
            term not in claimed
            or col.lower() == term.lower()
        ) and term not in out_names:
            if col.lower() != term.lower():
                claimed.add(term)
            keep.append(F.col(col).alias(term))
            out_names.add(term)
        elif not strict:
            if col in out_names or (term is not None and col == term):
                continue  # would duplicate an output name
            keep.append(F.col(col))
            out_names.add(col)
    return df.select(*keep)


def add_record_identity(
    df: DataFrame, data_resource_uid: str, unique_terms: list[str]
) -> DataFrame:
    """Adds dataResourceUid, rowKey (dr|terms...) and a deterministic uuid.

    The uuid is uuid5(namespace, rowKey) as a column expression: Spark has
    no uuid5 builtin, but sha1 is the same construction (uuid5 = SHA-1 of
    namespace+name with version bits), computed here JVM-side.
    """
    key = F.concat_ws(
        "|",
        F.lit(data_resource_uid),
        *[F.coalesce(F.col(t).cast("string"), F.lit("")) for t in unique_terms],
    )
    ns = UUID_NAMESPACE.bytes.hex()
    digest = F.sha1(F.concat(F.to_binary(F.lit(ns), F.lit("hex")), F.encode(key, "UTF-8")))
    # assemble RFC-4122 v5: time_hi version nibble = 5, clock_seq high bits = 10
    uuid_col = F.concat_ws(
        "-",
        F.substring(digest, 1, 8),
        F.substring(digest, 9, 4),
        F.concat(F.lit("5"), F.substring(digest, 14, 3)),
        F.concat(
            F.lower(
                F.conv(
                    (
                        F.conv(F.substring(digest, 17, 1), 16, 10).cast("int")
                        % 4
                        + 8
                    ).cast("string"),
                    10,
                    16,
                )
            ),
            F.substring(digest, 18, 3),
        ),
        F.substring(digest, 21, 12),
    )
    return (
        df.withColumn("dataResourceUid", F.lit(data_resource_uid))
        .withColumn("rowKey", key)
        .withColumn("uuid", uuid_col)
    )


def load_csv(
    spark: SparkSession,
    path: str,
    data_resource_uid: str,
    unique_terms: list[str],
    delimiter: str = ",",
    strict: bool = False,
) -> DataFrame:
    """DwcCSVLoader.loadFile as a reader: csv -> header mapping -> identity."""
    df = (
        spark.read.option("header", True)
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    mapped = map_headers(df, strict=strict)
    return add_record_identity(mapped, data_resource_uid, unique_terms)


def import_table(
    spark: SparkSession,
    path: str,
    columns: list[str],
    id_column_idx: int = 0,
    delimiter: str = "\t",
    quote: str = "|",
    escape: str = "$",
    has_header: bool = False,
) -> DataFrame:
    """Raw migration import (tool/ImportUtil.scala:20-113, the dev-only
    `import` tool): headerless delimited files with an EXPLICIT column
    list and the reference's exotic defaults (tab separator, '|' quote,
    '$' escape), the id column copied to rowKey. No DwC header mapping,
    no uuid minting — this bypasses the loader conventions on purpose,
    exactly like the reference's migration path. `has_header` replaces
    the reference's linesToSkip=1 case (the names are still taken from
    `columns`, positionally)."""
    if not columns:
        raise ValueError("import_table: an explicit column list is required")
    if not 0 <= id_column_idx < len(columns):
        raise ValueError(
            f"import_table: id_column_idx {id_column_idx} outside the "
            f"{len(columns)}-column list"
        )
    df = (
        spark.read.option("header", has_header)
        .option("delimiter", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .csv(path)
    )
    raw_cols = df.columns
    # exact-width contract, BOTH directions: a file wider than the name
    # list means a stale column list (or delimiter damage) and silently
    # dropping the trailing fields would corrupt the migration
    if len(raw_cols) != len(columns):
        raise ValueError(
            f"import_table: file has {len(raw_cols)} columns, "
            f"{len(columns)} names given — the positional list must "
            "match the file exactly"
        )
    named = df.select(
        *[df[raw_cols[i]].alias(name) for i, name in enumerate(columns)]
    )
    return named.withColumn("rowKey", F.col(columns[id_column_idx]))
