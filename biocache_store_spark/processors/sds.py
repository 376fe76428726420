"""Full sensitive-data-service (SDS) processing as DataFrame operations.

The reference's SensitivityProcessor (processor/SensitivityProcessor.scala:37-302)
delegates rule evaluation to the external `au.org.ala.sds` service and then
applies the outcome to the record. This module re-expresses BOTH halves
Spark-first:

  * rule matching — `SensitivityDAO.isSensitive` checks the exact name OR
    the matched taxonConceptID (caches/SensitivityDAO.scala:14-25); rules
    carry per-zone conservation instances (model/SensitiveSpecies.scala,
    the `<conservationInstance authority generalisation zone>` entries of
    the SDS species XML). Here the rules are a small broadcast dimension
    and matching is a pair of equi-joins (name key, lsid key) unioned —
    never a nested-loop OR join.
  * zone scoping — the SDS resolves the record's zone by spatial intersect
    with fallback to the vocab-matched stateProvince
    (SensitivityProcessor.scala:94-120). Here the zone test is
    `zone IS NULL OR zone = stateProvince OR zone = country` on the
    processed columns; when several instances apply the most restrictive
    wins (WITHHOLD > larger generalisation distance).
  * outcome application (SensitivityProcessor.scala:144-302):
      - WITHHOLD  -> coordinates nulled, informationWithheld set;
      - "Nkm"/"Nm" -> coordinates rounded to the grid implied by the
        distance, coordinateUncertaintyInMeters += generalisation
        (SensitivityProcessor.scala:181-201);
      - event fields (day, month, eventDate, eventDateEnd, eventTime,
        eventID, verbatimEventDate) and easting/northing blanked for every
        sensitive outcome (SensitivityProcessor.scala:229-258);
      - gridReference degraded to the generalisation resolution
        (GridUtil.convertReferenceToResolution, SensitivityProcessor.scala:204-222);
      - the exact originals preserved in an `originalSensitiveValues` map
        (incl. the processed uncertainty under the reference's
        `coordinateUncertaintyInMeters.p` key,
        SensitivityProcessor.scala:150-172).
  * un-processing — a record that is no longer sensitive but still carries
    originalSensitiveValues gets its raw values restored and the map
    cleared (SensitivityProcessor.scala:291-299).
  * index overlay — authorised consumers see `sensitive_*` companion
    fields rebuilt from the map unless the data resource is excluded
    (SolrIndexDAO.shouldIncludeSensitiveValue :297, IndexDAO.scala:1170-1186).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocache_store_spark.processors.assertions import AssertionCodes as C

# Fields withheld for every sensitive outcome (SensitivityProcessor.scala:229-258).
WITHHELD_EVENT_FIELDS = (
    "day",
    "month",
    "easting",
    "northing",
    "eventDate",
    "eventDateEnd",
    "eventID",
    "eventTime",
    "verbatimEventDate",
)

# Raw fields snapshotted into originalSensitiveValues
# (SensitivityProcessor.scala:150-172: the SDS result map plus the event
# fields the processor adds by hand).
_OSV_FIELDS = (
    "decimalLatitude",
    "decimalLongitude",
    "gridReference",
    "locality",
    "eventDate",
    "eventDateEnd",
    "eventTime",
    "eventID",
    "day",
    "month",
    "verbatimEventDate",
)

# IndexDAO.scala:1174-1182 — map key -> index field.
SENSITIVE_INDEX_FIELDS = {
    "decimalLatitude": "sensitive_latitude",
    "decimalLongitude": "sensitive_longitude",
    "coordinateUncertaintyInMeters.p": "sensitive_coordinate_uncertainty",
    "locality": "sensitive_locality",
    "eventDate": "sensitive_event_date",
    "eventDateEnd": "sensitive_event_date_end",
    "gridReference": "sensitive_grid_reference",
}


def exact_sci_name(df: DataFrame) -> F.Column:
    """The SDS lookup name ladder (SensitivityProcessor.getExactSciName
    :310-331): scientificName -> subspecies -> species ->
    genus [specificEpithet [infraspecificEpithet]] -> vernacularName."""

    def col_or_null(name: str) -> F.Column:
        return F.col(name) if name in df.columns else F.lit(None).cast("string")

    genus = col_or_null("genus")
    epithet = col_or_null("specificEpithet")
    infra = col_or_null("infraspecificEpithet")
    genus_name = F.when(
        genus.isNotNull() & epithet.isNotNull() & infra.isNotNull(),
        F.concat_ws(" ", genus, epithet, infra),
    ).when(
        genus.isNotNull() & epithet.isNotNull(), F.concat_ws(" ", genus, epithet)
    ).otherwise(genus)
    return F.coalesce(
        col_or_null("scientificName"),
        col_or_null("subspecies"),
        col_or_null("species"),
        genus_name,
        col_or_null("vernacularName"),
    )


def generalisation_metres(gen: F.Column) -> F.Column:
    """Parse an SDS generalisation string ("10km", "1km", "100m", numeric
    metres) to metres; WITHHOLD (and the legacy WITHHOLD spellings) parse
    to NULL — callers pair this with `is_withhold`."""
    g = F.upper(F.trim(gen))
    km = F.regexp_extract(g, r"^(\d+(?:\.\d+)?)KM$", 1)
    m = F.regexp_extract(g, r"^(\d+(?:\.\d+)?)M?$", 1)
    return (
        F.when(g.isin("WITHHOLD", "WITHOLD"), F.lit(None).cast("double"))
        .when(km != "", km.cast("double") * 1000.0)
        .when(m != "", m.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def is_withhold(gen: F.Column) -> F.Column:
    return F.upper(F.trim(gen)).isin("WITHHOLD", "WITHOLD")


_METRES_TO_DECIMALS = [(100000.0, 0), (10000.0, 1), (1000.0, 2), (100.0, 3), (10.0, 4)]


def generalise_coordinate(value: F.Column, metres: F.Column) -> F.Column:
    """Distance -> decimal-degree grid ladder (the SDS's
    coordinate-rounding convention: 10km ~ 0.1 deg, 1km ~ 0.01 deg, ...).
    round()'s scale must be foldable, hence the when-chain of literal
    scales."""
    expr = F.round(value, 5)
    for metres_limit, decimals in reversed(_METRES_TO_DECIMALS):
        expr = F.when(metres >= metres_limit, F.round(value, decimals)).otherwise(expr)
    return expr


def _rule_candidates(
    records: DataFrame,
    rules: DataFrame,
    id_col: str,
    state_col: str,
    country_col: str,
) -> DataFrame:
    """All zone-applicable (record, conservation-instance) pairs, matched
    by exact name OR taxonConceptID — as two broadcast equi-joins unioned,
    so the plan stays hash-join-shaped (an OR condition would force a
    nested-loop join)."""
    rule_cols = [
        F.lower(F.trim(F.col("scientificName"))).alias("__r_name"),
        (
            F.col("taxonConceptID")
            if "taxonConceptID" in rules.columns
            else F.lit(None)
        ).cast("string").alias("__r_lsid"),
        (F.col("zone") if "zone" in rules.columns else F.lit(None))
        .cast("string")
        .alias("sds_zone"),
        (F.col("category") if "category" in rules.columns else F.lit(None))
        .cast("string")
        .alias("sds_category"),
        (F.col("authority") if "authority" in rules.columns else F.lit(None))
        .cast("string")
        .alias("sds_authority"),
        F.col("generalisation").cast("string").alias("sds_generalisation"),
    ]
    dim = rules.select(*rule_cols)

    name_key = F.lower(F.trim(exact_sci_name(records)))
    lsid = (
        F.col("taxonConceptID")
        if "taxonConceptID" in records.columns
        else F.lit(None).cast("string")
    )
    state = (
        F.col(state_col) if state_col in records.columns else F.lit(None).cast("string")
    )
    country = (
        F.col(country_col)
        if country_col in records.columns
        else F.lit(None).cast("string")
    )
    keyed = records.select(
        F.col(id_col).alias("__rec_id"),
        name_key.alias("__rec_name"),
        lsid.alias("__rec_lsid"),
        state.alias("__rec_state"),
        country.alias("__rec_country"),
    )

    by_name = keyed.join(
        F.broadcast(dim), keyed["__rec_name"] == dim["__r_name"], "inner"
    )
    by_lsid = keyed.join(
        F.broadcast(dim),
        keyed["__rec_lsid"].isNotNull()
        & (keyed["__rec_lsid"] == dim["__r_lsid"]),
        "inner",
    )
    candidates = by_name.unionByName(by_lsid).dropDuplicates(
        ["__rec_id", "__r_name", "sds_zone", "sds_generalisation",
         "sds_category", "sds_authority"]
    )
    in_zone = (
        F.col("sds_zone").isNull()
        | (F.col("sds_zone") == F.col("__rec_state"))
        | (F.col("sds_zone") == F.col("__rec_country"))
    )
    return candidates.filter(in_zone)


def apply_sds(
    records: DataFrame,
    rules: DataFrame,
    id_col: str = "rowKey",
    state_col: str = "stateProvince",
    country_col: str = "country",
    lat_col: str = "decimalLatitude",
    lon_col: str = "decimalLongitude",
    uncertainty_col: str = "coordinateUncertaintyInMeters",
) -> DataFrame:
    """The full SensitivityProcessor outcome as one DataFrame transform.

    rules columns: scientificName, generalisation, and optionally
    taxonConceptID, zone, category, authority. Adds `sensitive`,
    `sds_category`, `informationWithheld`, `dataGeneralizations`,
    `originalSensitiveValues` (map<string,string>); REPLACES the
    coordinate/uncertainty/event columns with the generalised values.
    """
    candidates = _rule_candidates(records, rules, id_col, state_col, country_col)
    metres = generalisation_metres(F.col("sds_generalisation"))
    # most restrictive instance per record: WITHHOLD beats any distance
    # unparseable generalisations rank with WITHHOLD (they are treated
    # as withhold downstream — fail closed)
    rank = F.when(
        is_withhold(F.col("sds_generalisation")) | metres.isNull(),
        F.lit(float("inf")),
    ).otherwise(metres)
    # deterministic selection: ONE max_by of the whole rule payload
    # under a total-order key (rank, then every payload column) — three
    # independent max_by calls could mix fields from different tied
    # rules, and a rank-only key leaves ties engine-chosen
    key = F.struct(
        F.col("__rank"),
        F.col("sds_generalisation"),
        F.col("sds_category"),
        F.col("sds_authority"),
    )
    payload = F.struct(
        F.col("sds_generalisation").alias("g"),
        F.col("sds_category").alias("c"),
        F.col("sds_authority").alias("a"),
    )
    best = (
        candidates.withColumn("__rank", rank)
        .groupBy("__rec_id")
        .agg(F.max_by(payload, key).alias("__best"))
        .select(
            "__rec_id",
            F.col("__best.g").alias("sds_generalisation"),
            F.col("__best.c").alias("sds_category"),
            F.col("__best.a").alias("sds_authority"),
        )
    )

    joined = records.join(
        best, records[id_col] == best["__rec_id"], "left"
    ).drop("__rec_id")

    gen = F.col("sds_generalisation")
    metres = generalisation_metres(gen)
    # FAIL CLOSED: a sensitive rule whose generalisation string neither
    # parses to metres nor reads WITHHOLD must withhold, not publish the
    # record nearly unredacted with a NULLed uncertainty
    withhold = is_withhold(gen) | (gen.isNotNull() & metres.isNull())
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    has_coords = lat.isNotNull() & lon.isNotNull()
    sensitive = gen.isNotNull()
    generalised = sensitive & ~withhold & has_coords

    def raw_str(name: str) -> F.Column:
        if name in records.columns:
            return F.col(name).cast("string")
        return F.lit(None).cast("string")

    # originalSensitiveValues: the raw snapshot, nulls dropped — built with
    # map_from_arrays + filter (arrays_zip keeps the lambda tiny; the map
    # is ~10 entries so interpreted eval is irrelevant here).
    osv_entries = F.array(
        *[
            F.struct(F.lit(name).alias("k"), raw_str(name).alias("v"))
            for name in _OSV_FIELDS
        ],
        F.struct(
            F.lit(uncertainty_col + ".p").alias("k"),
            raw_str(uncertainty_col).alias("v"),
        ),
    )
    present = F.filter(osv_entries, lambda e: e["v"].isNotNull())
    osv = F.map_from_arrays(
        F.transform(present, lambda e: e["k"]),
        F.transform(present, lambda e: e["v"]),
    )

    uncertainty = (
        F.coalesce(F.col(uncertainty_col).cast("double"), F.lit(0.0))
        if uncertainty_col in records.columns
        else F.lit(0.0)
    )
    out = (
        joined.withColumn("sensitive", sensitive)
        .withColumn("originalSensitiveValues", F.when(sensitive, osv))
        .withColumn(
            "informationWithheld",
            F.when(
                sensitive & withhold,
                F.concat(
                    F.lit("Record is "),
                    F.coalesce(F.col("sds_category"), F.lit("sensitive")),
                    F.lit(": location withheld"),
                ),
            ),
        )
        .withColumn(
            "dataGeneralizations",
            F.when(
                generalised,
                F.concat(
                    F.lit("Coordinates generalised to "),
                    metres.cast("int").cast("string"),
                    F.lit("m ("),
                    F.coalesce(F.col("sds_category"), F.lit("sensitive")),
                    F.lit(")"),
                ),
            ),
        )
        .withColumn(
            lat_col,
            F.when(sensitive & withhold, F.lit(None).cast("string"))
            .when(generalised, generalise_coordinate(lat, metres).cast("string"))
            .otherwise(F.col(lat_col).cast("string")),
        )
        .withColumn(
            lon_col,
            F.when(sensitive & withhold, F.lit(None).cast("string"))
            .when(generalised, generalise_coordinate(lon, metres).cast("string"))
            .otherwise(F.col(lon_col).cast("string")),
        )
    )
    if uncertainty_col in records.columns:
        out = out.withColumn(
            uncertainty_col,
            F.when(sensitive & withhold, F.lit(None).cast("string"))
            .when(generalised, (uncertainty + metres).cast("string"))
            .otherwise(F.col(uncertainty_col).cast("string")),
        )
    if "locality" in records.columns:
        # a withheld location with a free-text locality ("Smith Creek
        # nest site") re-identifies the site; blank it under WITHHOLD
        # (the snapshot above preserves it for authorised consumers)
        out = out.withColumn(
            "locality",
            F.when(sensitive & withhold, F.lit(None).cast("string")).otherwise(
                F.col("locality").cast("string")
            ),
        )
    # blank the withheld event/grid fields for every sensitive outcome
    for name in WITHHELD_EVENT_FIELDS:
        if name in records.columns:
            out = out.withColumn(
                name, F.when(sensitive, F.lit(None).cast("string")).otherwise(
                    F.col(name).cast("string")
                )
            )
    if "gridReference" in records.columns:
        out = _generalise_grid_reference(out, metres, sensitive, withhold)
    qa = F.struct(
        F.lit(C.DATA_ARE_GENERALISED.code).alias("code"),
        F.lit(C.DATA_ARE_GENERALISED.name).alias("name"),
        F.when(sensitive, F.lit(0)).otherwise(F.lit(1)).alias("qa_status"),
        F.lit("").alias("comment"),
    )
    from biocache_store_spark.processors.assertions import append_assertion

    return append_assertion(out, qa)


def _generalise_grid_reference(
    df: DataFrame, metres: F.Column, sensitive: F.Column, withhold: F.Column
) -> DataFrame:
    """Degrade gridReference to the generalisation resolution
    (GridUtil.convertReferenceToResolution via SensitivityProcessor.scala:204-222);
    unknown resolutions blank the reference, withhold always blanks."""
    from pyspark.sql.pandas.functions import pandas_udf

    from biocache_store_spark.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    @pandas_udf("string")
    def degrade(refs, res):  # type: ignore[no-untyped-def]
        import pandas as pd

        from biocache_store_spark.parsers.gridref import grid_ref_as_resolutions

        out = []
        for ref, metres_val in zip(refs, res):
            if ref is None or pd.isna(metres_val):
                out.append(None)
                continue
            key = "grid_ref_" + str(int(metres_val))
            out.append(grid_ref_as_resolutions(ref).get(key))
        return pd.Series(out, dtype="object")

    return df.withColumn(
        "gridReference",
        F.when(sensitive & withhold, F.lit(None).cast("string"))
        .when(sensitive, degrade(F.col("gridReference"), metres))
        .otherwise(F.col("gridReference")),
    )


def unprocess_non_sensitive(
    records: DataFrame, fields: tuple[str, ...] = _OSV_FIELDS
) -> DataFrame:
    """Restore raw values for records that are NOT sensitive but still
    carry originalSensitiveValues from an earlier sensitive classification
    (SensitivityProcessor.scala:291-299: the stored map overwrites the raw
    columns, then the map itself is cleared)."""
    osv = F.col("originalSensitiveValues")
    stale = (~F.coalesce(F.col("sensitive"), F.lit(False))) & osv.isNotNull()
    out = records
    for name in fields:
        if name in records.columns:
            out = out.withColumn(
                name,
                F.when(stale, F.coalesce(osv.getItem(name), F.col(name))).otherwise(
                    F.col(name)
                ),
            )
    # the uncertainty snapshot lives under its ".p" key (the index-field
    # convention) — restore it as well or a once-generalised record keeps
    # the inflated/NULLed value forever once the map is cleared
    unc = "coordinateUncertaintyInMeters"
    if unc in records.columns:
        out = out.withColumn(
            unc,
            F.when(
                stale, F.coalesce(osv.getItem(unc + ".p"), F.col(unc))
            ).otherwise(F.col(unc)),
        )
    return out.withColumn(
        "originalSensitiveValues", F.when(stale, F.lit(None)).otherwise(osv)
    )


def overlay_sensitive_index_fields(
    index_df: DataFrame,
    excluded_data_resources: list[str] | None = None,
    dr_col: str = "dataResourceUid",
) -> DataFrame:
    """Index-side companion fields for authorised consumers
    (IndexDAO.scala:1170-1186): rebuild sensitive_latitude/longitude/
    uncertainty/locality/event dates/grid ref from originalSensitiveValues
    unless the data resource is in the exclusion list
    (SolrIndexDAO.shouldIncludeSensitiveValue :297)."""
    excluded = excluded_data_resources or []
    osv = F.col("originalSensitiveValues")
    include = osv.isNotNull() & ~F.col(dr_col).isin(excluded)
    out = index_df
    for key, field in SENSITIVE_INDEX_FIELDS.items():
        out = out.withColumn(field, F.when(include, osv.getItem(key)))
    return out
