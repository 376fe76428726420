"""DataFrame-level enrichment processors: attribution and sensitivity.

These are the reference's LRU-cached lookup services re-expressed as
broadcast dimension joins:

  * AttributionProcessor (processor/AttributionProcessor.scala:23-86 over
    caches/AttributionDAO.scala): dataResourceUid -> collectory metadata
    (names, provider, hubs) with UNRECOGNISED codes when the resource or
    the (institutionCode, collectionCode) pair is unknown.
  * SensitivityProcessor (processor/SensitivityProcessor.scala:37-310 over
    caches/SensitivityDAO.scala): match sensitive taxa, generalize
    coordinates to the category's grid, keep the exact values in an
    `originalSensitiveValues` map column so the index can overlay them for
    authorised consumers (SolrIndexDAO.shouldIncludeSensitiveValue :297).

Generalisation: metres -> decimal-degree rounding (10000m ~ 0.1 deg, 1000m
~ 0.01 deg, 100m ~ 0.001 deg — the reference's grid ladder at the
equator-ish scales it uses for Australian data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.processors.assertions import AssertionCodes as C


def _assertion(code: int, name: str, failed_when) -> F.Column:
    return F.struct(
        F.lit(code).alias("code"),
        F.lit(name).alias("name"),
        F.when(failed_when, F.lit(0)).otherwise(F.lit(1)).alias("qa_status"),
        F.lit("").alias("comment"),
    )


def _append_assertion(df: DataFrame, assertion_col) -> DataFrame:
    from biocache_store_spark.processors.assertions import append_assertion

    return append_assertion(df, assertion_col)


def enrich_attribution(records: DataFrame, data_resources: DataFrame) -> DataFrame:
    """Broadcast attribution join. data_resources columns:
    dataResourceUid, dataResourceName, dataProviderUid, dataProviderName,
    dataHubUid (array<string>), institutionUid, collectionUid."""
    dim = data_resources.select(
        F.col("dataResourceUid").alias("__dr_uid"),
        F.col("dataResourceName").alias("attr_dataResourceName"),
        F.col("dataProviderUid").alias("attr_dataProviderUid"),
        F.col("dataProviderName").alias("attr_dataProviderName"),
        F.col("dataHubUid").alias("attr_dataHubUid"),
    )
    joined = records.join(
        F.broadcast(dim), records["dataResourceUid"] == dim["__dr_uid"], "left"
    )
    # the join MARKER (kept uid), not the name, decides "unknown": a
    # registered resource whose name happens to be null must not be
    # flagged unrecognised. Materialized before the drop — the assertion
    # expression evaluates lazily, after __dr_uid is gone.
    joined = joined.withColumn(
        "__dr_known", F.col("__dr_uid").isNotNull()
    ).drop("__dr_uid")
    return _append_assertion(
        joined,
        _assertion(
            C.UNRECOGNISED_COLLECTIONCODE.code,
            C.UNRECOGNISED_COLLECTIONCODE.name,
            ~F.col("__dr_known"),
        ),
    ).drop("__dr_known")


_METRES_TO_DECIMALS = [(100000.0, 0), (10000.0, 1), (1000.0, 2), (100.0, 3), (10.0, 4)]


def _blur(value_col, metres_col) -> F.Column:
    """Round to the grid implied by the generalisation distance. round()'s
    scale must be foldable, so the ladder is a when-chain of literal
    scales."""
    expr = F.round(value_col, 5)
    for metres, decimals in reversed(_METRES_TO_DECIMALS):
        expr = F.when(metres_col >= metres, F.round(value_col, decimals)).otherwise(expr)
    return expr


def apply_sensitivity(
    records: DataFrame,
    sensitive_species: DataFrame,
    name_col: str = "scientificName",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    state_col: str = "stateProvince",
) -> DataFrame:
    """Broadcast sensitivity join + coordinate generalization.

    sensitive_species columns: scientificName, category,
    generalisationInMetres (double), optional zone (stateProvince name that
    scopes the rule; null = everywhere).
    Adds: sensitive (bool), dataGeneralizations, originalSensitiveValues
    map, and REPLACES the coordinate columns with blurred values for
    matching records.
    """
    # ONE dim row per name carrying ALL its rules as an array: a plain
    # per-rule join would emit one output row per matching rule (zoned
    # rule sets are exactly the multi-rule case), silently inflating
    # record counts. The best applicable rule is picked per record with
    # array expressions — no row multiplication possible by construction.
    rule = F.struct(
        F.col("generalisationInMetres").cast("double").alias("m"),
        F.col("category").cast("string").alias("c"),
        (
            F.col("zone") if "zone" in sensitive_species.columns else F.lit(None)
        ).cast("string").alias("z"),
    )
    dim = (
        sensitive_species.select(
            F.lower(F.trim(F.col("scientificName"))).alias("__sens_name"),
            rule.alias("__rule"),
        )
        .groupBy("__sens_name")
        .agg(F.collect_list("__rule").alias("__rules"))
    )
    joined = records.join(
        F.broadcast(dim),
        F.lower(F.trim(F.col(name_col))) == dim["__sens_name"],
        "left",
    ).drop("__sens_name")

    if state_col in records.columns:
        state = F.coalesce(F.col(state_col), F.lit(""))
        applicable = F.filter(
            F.col("__rules"), lambda r: r["z"].isNull() | (r["z"] == state)
        )
    else:
        # Fail CLOSED: without a state column we cannot prove a zoned rule
        # does NOT apply, so treat every rule as applicable and let the
        # most-restrictive pick below blur the coordinates. The alternative
        # (zoned rules never matching) would publish species protected only
        # by zoned rules at full precision.
        applicable = F.col("__rules")
    # most restrictive applicable rule (largest blur distance), category
    # as the deterministic tie-break — struct max orders field-by-field
    best = F.array_max(
        F.transform(applicable, lambda r: F.struct(r["m"].alias("m"), r["c"].alias("c")))
    )
    joined = (
        joined.withColumn("sens_metres", best["m"])
        .withColumn("sens_category", best["c"])
        .drop("__rules")
    )
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    # zone applicability is already folded into the best-rule pick above
    is_sensitive = (
        F.col("sens_metres").isNotNull() & lat.isNotNull() & lon.isNotNull()
    )
    blurred_lat = _blur(lat, F.col("sens_metres")).cast("string")
    blurred_lon = _blur(lon, F.col("sens_metres")).cast("string")

    out = (
        joined.withColumn("sensitive", is_sensitive)
        .withColumn(
            "originalSensitiveValues",
            F.when(
                is_sensitive,
                F.create_map(
                    F.lit(lat_col), F.col(lat_col).cast("string"),
                    F.lit(lon_col), F.col(lon_col).cast("string"),
                ),
            ),
        )
        .withColumn(
            "dataGeneralizations",
            F.when(
                is_sensitive,
                F.concat(
                    F.lit("Coordinates generalised to "),
                    F.col("sens_metres").cast("int").cast("string"),
                    F.lit("m ("),
                    F.coalesce(F.col("sens_category"), F.lit("sensitive")),
                    F.lit(")"),
                ),
            ),
        )
        .withColumn(lat_col, F.when(is_sensitive, blurred_lat).otherwise(F.col(lat_col)))
        .withColumn(lon_col, F.when(is_sensitive, blurred_lon).otherwise(F.col(lon_col)))
    )
    return _append_assertion(
        out,
        _assertion(
            C.DATA_ARE_GENERALISED.code, C.DATA_ARE_GENERALISED.name, is_sensitive
        ),
    )


def restore_sensitive_values(
    records: DataFrame,
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
) -> DataFrame:
    """Index-side overlay for authorised resources
    (SolrIndexDAO.scala:615-628): put the original coordinates back from
    originalSensitiveValues."""
    osv = F.col("originalSensitiveValues")
    return records.withColumn(
        lat_col, F.coalesce(osv.getItem(lat_col), F.col(lat_col))
    ).withColumn(lon_col, F.coalesce(osv.getItem(lon_col), F.col(lon_col)))
