"""Dimension-refresh loaders: conservation lists, habitats, attribution,
taxon profiles.

The reference rebuilds its lookup dimensions from external services —
ConservationListLoader / HabitatLoader (load/TaxonProfileLoader.scala:
species-list rows keyed to LSIDs, IRMNG isMarine -> Marine/Terrestrial) and
UpdateAttribution (tool/UpdateAttribution.scala: collectory attribution
refresh). This engine treats those dimensions as TABLES the operators
consume (FIXTURES.md), so the refresh tools reduce to one generic
ingest: read a CSV/JSON dump, rename columns into the dim schema the
chain expects, fill the optional columns, and hand the DataFrame to the
same enrich/SDS operators — no service client, no per-record loop; the
network fetch stays outside the engine (same gating as sources/archive.py).

Each loader returns a plain DataFrame in exactly the schema its consumer
documents:

  * taxon profiles  -> processors/chain.py enrich_classification `taxa`
  * conservation    -> processors/sds.py apply_sds `rules`
  * habitats        -> a (taxonConceptID, habitats) lookup join
  * attribution     -> processors/enrichment.py enrich_attribution `dims`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_dim_table(
    spark: SparkSession,
    path: str,
    column_map: dict[str, str],
    optional: dict[str, str] | None = None,
    fmt: str = "csv",
) -> DataFrame:
    """Generic dim ingest: read a header'd CSV (or JSONL) dump, project
    `column_map` (source column -> dim column; a missing source column
    becomes NULL rather than failing, matching the reference loaders'
    tolerance of partial exports), then add `optional` columns
    (dim column -> cast type) as NULLs when the dump lacks them."""
    if fmt == "csv":
        raw = spark.read.option("header", "true").csv(path)
    elif fmt == "json":
        raw = spark.read.json(path)
    else:
        raise ValueError(f"load_dim_table: unknown format {fmt!r}")
    cols = []
    for src, dst in column_map.items():
        if src in raw.columns:
            cols.append(F.col(src).alias(dst))
        else:
            cols.append(F.lit(None).cast("string").alias(dst))
    out = raw.select(*cols)
    for dst, dtype in (optional or {}).items():
        if dst not in out.columns:
            out = out.withColumn(dst, F.lit(None).cast(dtype))
    return out


def load_taxon_profiles(spark: SparkSession, path: str, fmt: str = "csv") -> DataFrame:
    """Taxon-profile dim for enrich_classification: scientificName,
    taxonConceptID, taxonRank, lft, rgt, vernacularName, kingdom
    (load/TaxonProfileLoader.scala's stored `taxon` family)."""
    out = load_dim_table(
        spark,
        path,
        {
            "scientificName": "scientificName",
            "taxonConceptID": "taxonConceptID",
            "guid": "__guid",
            "taxonRank": "taxonRank",
            "lft": "__lft",
            "rgt": "__rgt",
            "vernacularName": "vernacularName",
            "kingdom": "kingdom",
        },
        fmt=fmt,
    )
    return out.select(
        "scientificName",
        F.coalesce(F.col("taxonConceptID"), F.col("__guid")).alias("taxonConceptID"),
        "taxonRank",
        F.col("__lft").cast("int").alias("lft"),
        F.col("__rgt").cast("int").alias("rgt"),
        "vernacularName",
        "kingdom",
    )


def load_conservation_list(spark: SparkSession, path: str, fmt: str = "csv") -> DataFrame:
    """Conservation/sensitivity rules dim for apply_sds
    (ConservationListLoader semantics: one rule row per species-list
    entry, region scope -> zone, status -> category, generalisation as
    the SDS distance/WITHHOLD string)."""
    return load_dim_table(
        spark,
        path,
        {
            "scientificName": "scientificName",
            "taxonConceptID": "taxonConceptID",
            "region": "zone",
            "status": "category",
            "authority": "authority",
            "generalisation": "generalisation",
        },
        fmt=fmt,
    )


def load_habitat_dim(spark: SparkSession, path: str, fmt: str = "csv") -> DataFrame:
    """Habitat lookup (HabitatLoader: IRMNG isMarine boolean ->
    'Marine'/'Terrestrial' stored per LSID). Accepts either an isMarine
    boolean-ish column or a pre-labelled habitats column."""
    out = load_dim_table(
        spark,
        path,
        {
            "taxonConceptID": "taxonConceptID",
            "guid": "__guid",
            "isMarine": "__is_marine",
            "habitats": "__habitats",
        },
        fmt=fmt,
    )
    is_marine = F.lower(F.trim(F.col("__is_marine")))
    return out.select(
        F.coalesce(F.col("taxonConceptID"), F.col("__guid")).alias("taxonConceptID"),
        F.coalesce(
            F.col("__habitats"),
            F.when(is_marine.isin("true", "1", "t", "yes"), F.lit("Marine")).when(
                is_marine.isin("false", "0", "f", "no"), F.lit("Terrestrial")
            ),
        ).alias("habitats"),
    ).filter(F.col("taxonConceptID").isNotNull())


def load_attribution_dim(spark: SparkSession, path: str, fmt: str = "csv") -> DataFrame:
    """Attribution dim for enrich_attribution (UpdateAttribution /
    caches/AttributionDAO.scala shape): dataResourceUid, resource and
    provider names, and the hub membership list (semicolon- or
    pipe-separated in collectory dumps -> array<string>)."""
    out = load_dim_table(
        spark,
        path,
        {
            "dataResourceUid": "dataResourceUid",
            "dataResourceName": "dataResourceName",
            "dataProviderUid": "dataProviderUid",
            "dataProviderName": "dataProviderName",
            "dataHubUid": "__hubs",
        },
        fmt=fmt,
    )
    hubs = F.filter(
        F.transform(
            F.split(F.coalesce(F.col("__hubs"), F.lit("")), r"[;|]"),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    return out.select(
        "dataResourceUid",
        "dataResourceName",
        "dataProviderUid",
        "dataProviderName",
        hubs.alias("dataHubUid"),
    ).filter(F.col("dataResourceUid").isNotNull())
