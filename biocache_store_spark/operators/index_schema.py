"""The index field-mapping table as DATA.

Port of index/IndexDAO.scala:212-466: `headerAttributes` (+ the
`headerAttributesFix` unprocessed-field extension, :409-431) — tuples of
(cassandraField, solrField, arity, mode) that drive the ~140-column index
projection. Modes (IndexDAO.scala:199-202): RAW_AND_PARSED=0 (raw value,
parsed fallback — getValue(checkParsed=true)), RAW=2, PARSED=3 (processed
value); IGNORE entries are computed fields emitted by the projection
itself and are listed in operators/index_projection.py instead. Arity
(IndexDAO.scala comment :205): 0 = date, 4 = multivalue, -1 = plain
string.

SOLR field names containing '-' or '.' are sanitized to '_' (parquet/Spark
friendly): point-0.1 -> point_0_1.
"""

from __future__ import annotations

RAW_AND_PARSED = "raw_and_parsed"
RAW = "raw"
PARSED = "parsed"

DATE = 0
MULTI = 4
STR = -1

# (cassandraField, solrField, arity, mode) — IndexDAO.scala:212-403
HEADER_ATTRIBUTES: list[tuple[str, str, int, str]] = [
    ("dateIdentified", "identified_date", DATE, PARSED),
    ("firstLoaded", "first_loaded_date", DATE, RAW),
    ("lastModifiedTime", "last_load_date", DATE, RAW),
    ("lastModifiedTime", "last_processed_date", DATE, PARSED),
    ("lastUserAssertionDate", "last_assertion_date", DATE, RAW),
    ("eventDate", "occurrence_date", DATE, PARSED),
    ("eventDateEnd", "occurrence_date_end_dt", DATE, PARSED),
    ("loanDate", "loan_date", DATE, RAW),
    ("loanReturnDate", "loan_return_date", DATE, RAW),
    ("modified", "modified_date", DATE, PARSED),
    ("dataHubUid", "data_hub_uid", MULTI, RAW_AND_PARSED),
    ("speciesGroups", "species_group", MULTI, PARSED),
    ("interactions", "interaction", MULTI, PARSED),
    ("taxonomicIssue", "taxonomic_issue", MULTI, PARSED),
    ("speciesHabitats", "species_habitats", MULTI, PARSED),
    ("duplicationType", "duplicate_type", MULTI, PARSED),
    ("establishmentMeans", "establishment_means", MULTI, PARSED),
    ("dataProviderName", "data_provider", STR, RAW_AND_PARSED),
    ("dataProviderUid", "data_provider_uid", STR, RAW_AND_PARSED),
    ("dataResourceName", "data_resource", STR, RAW_AND_PARSED),
    ("dataResourceUid", "data_resource_uid", STR, RAW_AND_PARSED),
    ("catalogNumber", "catalogue_number", STR, RAW),
    ("collectionCode", "collection_code", STR, RAW),
    ("countryCode", "country_code", STR, RAW),
    ("datasetName", "dataset_name", STR, RAW),
    ("datePrecision", "date_precision", STR, RAW),
    ("decimalLatitude", "raw_latitude", STR, RAW),
    ("decimalLongitude", "raw_longitude", STR, RAW),
    ("duplicates", "duplicate_inst", STR, RAW),
    ("eventID", "event_id", STR, RAW),
    ("taxonomicallyKosher", "taxonomic_kosher", STR, RAW),
    ("geodeticDatum", "raw_datum", STR, RAW),
    ("geodeticDatum", "datum", STR, PARSED),
    ("samplingProtocol", "raw_sampling_protocol", STR, RAW),
    ("samplingProtocol", "sampling_protocol", STR, PARSED),
    ("georeferenceVerificationStatus", "raw_geo_validation_status", STR, RAW),
    ("identificationQualifier", "raw_identification_qualifier", STR, RAW),
    ("identifiedBy", "identified_by", STR, RAW),
    ("individualCount", "individual_count", STR, RAW),
    ("institutionCode", "institution_code", STR, RAW),
    ("loanDestination", "loan_destination", STR, RAW),
    ("loanForBotanist", "loan_botanist", STR, RAW),
    ("loanIdentifier", "loan_identifier", STR, RAW),
    ("loanSequenceNumber", "loan_number", STR, RAW),
    ("locality", "raw_locality", STR, RAW),
    ("locationID", "location_id", STR, RAW),
    ("locationRemarks", "location_remarks", STR, RAW),
    ("occurrenceDetails", "occurrence_details", STR, RAW),
    ("occurrenceID", "occurrence_id", STR, RAW),
    ("occurrenceRemarks", "occurrence_remarks", STR, RAW),
    ("occurrenceStatus", "raw_occurrence_status", STR, RAW),
    ("originalNameUsage", "original_name_usage", STR, RAW),
    ("phenology", "life_stage", STR, RAW),
    ("photographer", "photographer", STR, RAW),
    ("recordedBy", "collector", STR, RAW),
    ("recordNumber", "record_number", STR, RAW),
    ("reproductiveCondition", "reproductive_condition", STR, RAW),
    ("rights", "rights", STR, RAW),
    ("rowkey", "row_key", STR, RAW),
    ("sex", "raw_sex", STR, RAW),
    ("taxonConceptID", "taxon_concept_lsid", STR, PARSED),
    ("typeStatus", "raw_type_status", STR, RAW),
    ("userId", "user_id", STR, RAW),
    ("userId", "alau_user_id", STR, RAW),
    ("uuid", "id", STR, RAW),
    ("vernacularName", "raw_common_name", STR, RAW),
    ("distanceOutsideExpertRange", "distance_outside_expert_range", STR, PARSED),
    ("associatedOccurrences", "duplicate_record", STR, PARSED),
    ("basisOfRecord", "basis_of_record", STR, PARSED),
    ("classs", "class", STR, PARSED),
    ("collectionName", "collection_name", STR, PARSED),
    ("collectionUid", "collection_uid", STR, PARSED),
    ("coordinateUncertaintyInMeters", "coordinate_uncertainty", STR, PARSED),
    ("country", "country", STR, PARSED),
    ("dataHub", "data_hub", STR, PARSED),
    ("decimalLatitude", "latitude", STR, PARSED),
    ("decimalLongitude", "longitude", STR, PARSED),
    ("duplicationStatus", "duplicate_status", STR, PARSED),
    ("family", "family", STR, PARSED),
    ("georeferenceVerificationStatus", "georeference_verification_status", STR, PARSED),
    ("genus", "genus", STR, PARSED),
    ("genusID", "genus_guid", STR, PARSED),
    ("identificationQualifier", "identification_qualifier", STR, PARSED),
    ("identificationVerificationStatus", "identification_verification_status", STR, PARSED),
    ("institutionName", "institution_name", STR, PARSED),
    ("institutionUid", "institution_uid", STR, PARSED),
    ("infraspecificEpithet", "infraspecific_epithet", STR, RAW),
    ("kingdom", "kingdom", STR, PARSED),
    ("left", "lft", STR, PARSED),
    ("lga", "places", STR, PARSED),
    ("license", "license", STR, PARSED),
    ("maximumDepthInMeters", "max_depth_d", STR, PARSED),
    ("maximumElevationInMeters", "max_elevation_d", STR, PARSED),
    ("minimumDepthInMeters", "min_depth_d", STR, PARSED),
    ("minimumElevationInMeters", "min_elevation_d", STR, PARSED),
    ("month", "month", STR, PARSED),
    ("nameMatchMetric", "name_match_metric", STR, PARSED),
    ("nameParseType", "name_parse_type", STR, PARSED),
    ("occurrenceStatus", "occurrence_status", STR, PARSED),
    ("order", "order", STR, PARSED),
    ("phylum", "phylum", STR, PARSED),
    ("provenance", "provenance", STR, PARSED),
    ("recordedBy", "collectors", STR, PARSED),
    ("right", "rgt", STR, PARSED),
    ("scientificName", "taxon_name", STR, PARSED),
    ("species", "species", STR, PARSED),
    ("speciesID", "species_guid", STR, PARSED),
    ("specificEpithet", "specific_epithet", STR, RAW),
    ("stateProvince", "state", STR, PARSED),
    ("taxonRank", "rank", STR, PARSED),
    ("taxonRankID", "rank_id", STR, PARSED),
    ("typeStatus", "type_status", STR, PARSED),
    ("verbatimDepth", "depth", STR, PARSED),
    ("verbatimElevation", "elevation", STR, PARSED),
    ("vernacularName", "common_name", STR, PARSED),
    ("year", "year", STR, PARSED),
]

# headerAttributesFix (IndexDAO.scala:409-431): unprocessed raw columns
HEADER_ATTRIBUTES_FIX: list[tuple[str, str, int, str]] = [
    ("verbatimElevation", "raw_verbatim_elevation", STR, RAW),
    ("verbatimDepth", "raw_verbatim_depth", STR, RAW),
    ("taxonRank", "raw_rank", STR, RAW),
    ("stateProvince", "raw_state", STR, RAW),
    ("scientificName", "raw_taxon_name", STR, RAW),
    ("phylum", "raw_phylum", STR, RAW),
    ("order", "raw_order", STR, RAW),
    ("month", "raw_month", STR, RAW),
    ("minimumElevationInMeters", "raw_min_elevation", STR, RAW),
    ("minimumDepthInMeters", "raw_min_depth", STR, RAW),
    ("maximumElevationInMeters", "raw_max_elevation", STR, RAW),
    ("maximumDepthInMeters", "raw_max_depth", STR, RAW),
    ("license", "raw_license", STR, RAW),
    ("kingdom", "raw_kingdom", STR, RAW),
    ("genus", "raw_genus", STR, RAW),
    ("family", "raw_family", STR, RAW),
    ("country", "raw_country", STR, RAW),
    ("coordinateUncertaintyInMeters", "raw_coordinate_uncertainty", STR, RAW),
    ("classs", "raw_class", STR, RAW),
    ("basisOfRecord", "raw_basis_of_record", STR, RAW),
    ("associatedOccurrences", "raw_duplicate_record", STR, RAW),
    ("establishmentMeans", "raw_establishment_means", MULTI, RAW),
    ("dateIdentified", "raw_identified_date", DATE, RAW),
    ("eventDate", "raw_occurrence_date", DATE, RAW),
    ("eventDateEnd", "raw_occurrence_date_end_dt", DATE, RAW),
    ("modified", "raw_modified_date", DATE, RAW),
]

ALL_ATTRIBUTES = HEADER_ATTRIBUTES + HEADER_ATTRIBUTES_FIX


def sanitize(solr_field: str) -> str:
    return solr_field.replace("-", "_").replace(".", "_")
