"""Index projection: processed records -> the flat, typed query surface.

The reference's "index" stage denormalizes each stored row into ~140 typed
SOLR fields (index/SolrIndexDAO.indexFromMap :630-1010 +
IndexDAO.getOccIndexModel :516-899). Here it is ONE wide select over the
processed DataFrame — raw-vs-parsed precedence, typed casts, the
multi-precision point ladder, occurrence_year/decade, assertion roll-ups
(array higher-order functions, no UDFs) and the kosher gate — producing the
parquet-backed `index` table every facet/filter/export query runs against.

All expressions are built-ins, so the whole projection is a single
whole-stage-codegen pass over the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rounded_point(lat: Column, lon: Column, decimals: int) -> Column:
    """One rung of the point ladder as 'lat,lon' with trailing zeros
    stripped (IndexDAO.getLatLongStringStep semantics, IndexDAO.scala:170-210)."""

    def fmt(c: Column) -> Column:
        s = F.format_number(F.round(c, decimals), decimals)
        s = F.regexp_replace(s, ",", "")  # format_number groups thousands
        s = F.regexp_replace(s, r"\.?0+$", "")
        return s

    return F.when(
        lat.isNotNull() & lon.isNotNull(), F.concat(fmt(lat), F.lit(","), fmt(lon))
    )


def _qa_names(assertions: Column, status: int) -> Column:
    return F.transform(
        F.filter(assertions, lambda a: a["qa_status"] == status),
        lambda a: a["name"],
    )


def build_index(processed_df: DataFrame) -> DataFrame:
    """processed occurrences (output of processors.chain.process_records,
    optionally enriched) -> flat index table."""
    df = processed_df
    p = F.col("processed")

    def parsed_or_raw(field: str) -> Column:
        # getParsedValueIfAvailable (IndexDAO.scala:135)
        raw = F.col(field) if field in df.columns else F.lit(None).cast("string")
        return F.coalesce(p[field], raw)

    lat = p["decimalLatitude"].cast("double")
    lon = p["decimalLongitude"].cast("double")
    year = p["year"].cast("int")

    cols = [
        F.col("occurrenceID").alias("id"),
        F.col("dataResourceUid").alias("data_resource_uid"),
        parsed_or_raw("basisOfRecord").alias("basis_of_record"),
        parsed_or_raw("recordedBy").alias("collector"),
        p["occurrenceStatus"].alias("occurrence_status"),
        p["typeStatus"].alias("type_status"),
        p["establishmentMeans"].alias("establishment_means"),
        # event
        p["eventDate"].alias("occurrence_date"),
        p["eventDateEnd"].alias("occurrence_date_end"),
        year.alias("occurrence_year"),
        p["month"].cast("int").alias("occurrence_month"),
        p["day"].cast("int").alias("occurrence_day"),
        # occurrence_decade (IndexDAO.scala:578-585)
        (F.floor(year / 10) * 10).cast("int").alias("occurrence_decade"),
        p["datePrecision"].alias("date_precision"),
        # location (typed)
        lat.alias("latitude"),
        lon.alias("longitude"),
        F.when(
            lat.isNotNull() & lon.isNotNull(),
            F.concat(p["decimalLatitude"], F.lit(","), p["decimalLongitude"]),
        ).alias("lat_long"),
        _rounded_point(lat, lon, 0).alias("point_1"),
        _rounded_point(lat, lon, 1).alias("point_0_1"),
        _rounded_point(lat, lon, 2).alias("point_0_01"),
        _rounded_point(lat, lon, 3).alias("point_0_001"),
        _rounded_point(lat, lon, 4).alias("point_0_0001"),
        p["geodeticDatum"].alias("geodetic_datum"),
        p["coordinateUncertaintyInMeters"].cast("double").alias(
            "coordinate_uncertainty"
        ),
        F.col("geospatially_kosher").alias("geospatial_kosher"),
        # assertion roll-ups (SolrIndexDAO.extractPassAndFailed :609-629)
        _qa_names(F.col("assertions"), 0).alias("assertions_failed"),
        _qa_names(F.col("assertions"), 1).alias("assertions_passed"),
        F.size(_qa_names(F.col("assertions"), 0)).alias("n_assertions_failed"),
        F.col("assertions").alias("system_assertions"),
    ]
    # optional classification enrichment columns
    for src, dst in (
        ("matched_taxonConceptID", "taxon_concept_lsid"),
        ("matched_taxonRank", "rank"),
        ("matched_lft", "lft"),
        ("matched_rgt", "rgt"),
        ("matched_vernacularName", "common_name"),
    ):
        if src in df.columns:
            cols.append(F.col(src).alias(dst))
    if "scientificName" in df.columns:
        cols.append(F.col("scientificName").alias("taxon_name"))
    if "stateProvince" in df.columns:
        cols.append(F.col("stateProvince").alias("state"))
    if "country" in df.columns:
        cols.append(F.col("country").alias("country"))
    return df.select(*cols)


def facet_counts(index_df: DataFrame, field: str, limit: int | None = None) -> DataFrame:
    """pageOverFacet (SolrIndexDAO.scala:299-329): counts by field value."""
    out = (
        index_df.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("facet_value"))
        .agg(F.count(F.lit(1)).alias("facet_count"))
        .orderBy(F.col("facet_count").desc(), F.col("facet_value"))
    )
    return out.limit(limit) if limit else out


def distinct_values(index_df: DataFrame, field: str, max_values: int = 1000) -> DataFrame:
    """getDistinctValues (SolrIndexDAO.scala:1500-1532)."""
    return (
        index_df.select(F.col(field).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .limit(max_values)
    )
