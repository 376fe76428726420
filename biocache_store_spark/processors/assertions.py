"""Quality-assertion codes and helpers.

Codes and names ported from vocab/AssertionCodes.scala:15-160 (the code
numbers are the public contract — they partition by processor:
geospatial [0,10000), taxonomic [10000,20000), miscellaneous [20000,30000),
temporal [30000,40000)). qa_status follows vocab/AssertionStatus.scala:
0=FAILED (the issue is present), 1=PASSED (checked, not present),
2=UNCHECKED.
"""

from __future__ import annotations

from dataclasses import dataclass

FAILED = 0
PASSED = 1
UNCHECKED = 2


@dataclass(frozen=True)
class ErrorCode:
    name: str
    code: int
    fatal: bool = False


class AssertionCodes:
    # geospatial [0, 10000)
    GEOSPATIAL_ISSUE = ErrorCode("geospatialIssue", 0, True)
    NEGATED_LATITUDE = ErrorCode("negatedLatitude", 1)
    NEGATED_LONGITUDE = ErrorCode("negatedLongitude", 2)
    INVERTED_COORDINATES = ErrorCode("invertedCoordinates", 3)
    ZERO_COORDINATES = ErrorCode("zeroCoordinates", 4, True)
    COORDINATES_OUT_OF_RANGE = ErrorCode("coordinatesOutOfRange", 5, True)
    UNKNOWN_COUNTRY_NAME = ErrorCode("unknownCountry", 6)
    ALTITUDE_OUT_OF_RANGE = ErrorCode("altitudeOutOfRange", 7)
    BADLY_FORMED_ALTITUDE = ErrorCode("erroneousAltitude", 8)
    MIN_MAX_ALTITUDE_REVERSED = ErrorCode("minMaxAltitudeReversed", 9)
    DEPTH_IN_FEET = ErrorCode("depthInFeet", 10)
    DEPTH_OUT_OF_RANGE = ErrorCode("depthOutOfRange", 11)
    MIN_MAX_DEPTH_REVERSED = ErrorCode("minMaxDepthReversed", 12)
    ALTITUDE_IN_FEET = ErrorCode("altitudeInFeet", 13)
    ALTITUDE_NON_NUMERIC = ErrorCode("altitudeNonNumeric", 14)
    DEPTH_NON_NUMERIC = ErrorCode("depthNonNumeric", 15)
    COUNTRY_COORDINATE_MISMATCH = ErrorCode("countryCoordinateMismatch", 16)
    PRECISION_RANGE_MISMATCH = ErrorCode("precisionRangeMismatch", 17)
    STATE_COORDINATE_MISMATCH = ErrorCode("stateCoordinateMismatch", 18)
    COORDINATE_HABITAT_MISMATCH = ErrorCode("habitatMismatch", 19, True)
    DETECTED_OUTLIER = ErrorCode("detectedOutlier", 20, True)
    COUNTRY_INFERRED_FROM_COORDINATES = ErrorCode("countryInferredByCoordinates", 21)
    COORDINATES_CENTRE_OF_STATEPROVINCE = ErrorCode(
        "coordinatesCentreOfStateProvince", 22, True
    )
    COORDINATE_PRECISION_MISMATCH = ErrorCode("coordinatePrecisionMismatch", 23)
    UNCERTAINTY_RANGE_MISMATCH = ErrorCode("uncertaintyRangeMismatch", 24)
    UNCERTAINTY_IN_PRECISION = ErrorCode("uncertaintyInPrecision", 25)
    SPECIES_OUTSIDE_EXPERT_RANGE = ErrorCode("speciesOutsideExpertRange", 26, True)
    UNCERTAINTY_NOT_SPECIFIED = ErrorCode("uncertaintyNotSpecified", 27)
    COORDINATES_CENTRE_OF_COUNTRY = ErrorCode("coordinatesCentreOfCountry", 28, True)
    MISSING_COORDINATEPRECISION = ErrorCode("missingCoordinatePrecision", 29)
    MISSING_GEODETICDATUM = ErrorCode("missingGeodeticDatum", 30)
    MISSING_GEOREFERENCEDBY = ErrorCode("missingGeorefencedBy", 31)
    MISSING_GEOREFERENCEPROTOCOL = ErrorCode("missingGeoreferenceProtocol", 32)
    MISSING_GEOREFERENCESOURCES = ErrorCode("missingGeoreferenceSources", 33)
    MISSING_GEOREFERENCEVERIFICATIONSTATUS = ErrorCode(
        "missingGeoreferenceVerificationStatus", 34
    )
    INVALID_GEODETICDATUM = ErrorCode("invalidGeodeticDatum", 35)
    MISSING_GEOREFERENCE_DATE = ErrorCode("missingGeoreferenceDate", 42)
    LOCATION_NOT_SUPPLIED = ErrorCode("locationNotSupplied", 43)
    DECIMAL_COORDINATES_NOT_SUPPLIED = ErrorCode("decimalCoordinatesNotSupplied", 44)
    DECIMAL_LAT_LONG_CONVERTED = ErrorCode("decimalLatLongConverted", 45)
    DECIMAL_LAT_LONG_CONVERSION_FAILED = ErrorCode(
        "decimalLatLongConversionFailed", 46, True
    )
    DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM = ErrorCode(
        "decimalLatLongCalculatedFromVerbatim", 47
    )
    DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED = ErrorCode(
        "decimalLatLongCalculationFromVerbatimFailed", 48, True
    )
    DECIMAL_LAT_LONG_CALCULATED_FROM_EASTING_NORTHING = ErrorCode(
        "decimalLatLongCalculatedFromEastingNorthing", 49
    )
    DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED = ErrorCode(
        "decimalLatLongCalculationFromEastingNorthingFailed", 50, True
    )
    GEODETIC_DATUM_ASSUMED_WGS84 = ErrorCode("geodeticDatumAssumedWgs84", 51)
    UNRECOGNIZED_GEODETIC_DATUM = ErrorCode("unrecognizedGeodeticDatum", 52)
    ZERO_LATITUDE_COORDINATES = ErrorCode("zeroLatitude", 53, True)
    ZERO_LONGITUDE_COORDINATES = ErrorCode("zeroLongitude", 54, True)
    DECIMAL_LAT_LONG_CALCULATED_FROM_GRID_REF = ErrorCode(
        "decimalLatLongCalculatedFromGridReference", 55
    )

    # taxonomic [10000, 20000)
    TAXONOMIC_ISSUE = ErrorCode("taxonomicIssue", 10000)
    INVALID_SCIENTIFIC_NAME = ErrorCode("invalidScientificName", 10001)
    UNKNOWN_KINGDOM = ErrorCode("unknownKingdom", 10002)
    AMBIGUOUS_NAME = ErrorCode("ambiguousName", 10003)
    NAME_NOTRECOGNISED = ErrorCode("nameNotRecognised", 10004)
    NAME_NOT_IN_NATIONAL_CHECKLISTS = ErrorCode("nameNotInNationalChecklists", 10005)
    HOMONYM_ISSUE = ErrorCode("homonymIssue", 10006)
    IDENTIFICATION_INCORRECT = ErrorCode("identificationIncorrect", 10007)
    MISSING_TAXONRANK = ErrorCode("missingTaxonRank", 10008)
    MISSING_IDENTIFICATIONQUALIFIER = ErrorCode("missingIdentificationQualifier", 10009)
    MISSING_IDENTIFIEDBY = ErrorCode("missingIdentifiedBy", 10010)
    MISSING_IDENTIFICATIONREFERENCES = ErrorCode("missingIdentificationReferences", 10011)
    MISSING_DATEIDENTIFIED = ErrorCode("missingDateIdentified", 10012)
    NAME_NOT_SUPPLIED = ErrorCode("nameNotSupplied", 10015)

    # miscellaneous [20000, 30000)
    MISSING_BASIS_OF_RECORD = ErrorCode("missingBasisOfRecord", 20001, True)
    BADLY_FORMED_BASIS_OF_RECORD = ErrorCode("badlyFormedBasisOfRecord", 20002, True)
    UNRECOGNISED_TYPESTATUS = ErrorCode("unrecognisedTypeStatus", 20004)
    UNRECOGNISED_COLLECTIONCODE = ErrorCode("unrecognisedCollectionCode", 20005)
    UNRECOGNISED_INSTITUTIONCODE = ErrorCode("unrecognisedInstitutionCode", 20006)
    INVALID_IMAGE_URL = ErrorCode("invalidImageUrl", 20007)
    RESOURCE_TAXONOMIC_SCOPE_MISMATCH = ErrorCode(
        "resourceTaxonomicScopeMismatch", 20008
    )
    DATA_ARE_GENERALISED = ErrorCode("dataAreGeneralised", 20009)
    OCCURRENCE_IS_CULTIVATED_OR_ESCAPEE = ErrorCode("occCultivatedEscapee", 20010)
    INFERRED_DUPLICATE_RECORD = ErrorCode("inferredDuplicateRecord", 20014)
    MISSING_CATALOGUENUMBER = ErrorCode("missingCatalogueNumber", 20015)
    RECORDED_BY_UNPARSABLE = ErrorCode("recordedByUnparsable", 20016)
    UNRECOGNISED_OCCURRENCE_STATUS = ErrorCode("unrecognisedOccurrenceStatus", 20017)
    ASSUMED_PRESENT_OCCURRENCE_STATUS = ErrorCode(
        "assumedPresentOccurrenceStatus", 20018
    )
    USER_ASSERTION_OTHER = ErrorCode("userAssertionOther", 20019)
    USER_DUPLICATE_RECORD = ErrorCode("userDuplicateRecord", 20020)

    # temporal [30000, 40000)
    TEMPORAL_ISSUE = ErrorCode("temporalIssue", 30000)
    ID_PRE_OCCURRENCE = ErrorCode("idPreOccurrence", 30001)
    GEOREFERENCE_POST_OCCURRENCE = ErrorCode("georefPostDate", 30002)
    FIRST_OF_MONTH = ErrorCode("firstOfMonth", 30003)
    FIRST_OF_YEAR = ErrorCode("firstOfYear", 30004)
    FIRST_OF_CENTURY = ErrorCode("firstOfCentury", 30005)
    DATE_PRECISION_MISMATCH = ErrorCode("datePrecisionMismatch", 30006)
    INVALID_COLLECTION_DATE = ErrorCode("invalidCollectionDate", 30007)
    MISSING_COLLECTION_DATE = ErrorCode("missingCollectionDate", 30008)
    DAY_MONTH_TRANSPOSED = ErrorCode("dayMonthTransposed", 30009)
    INCOMPLETE_COLLECTION_DATE = ErrorCode("incompleteCollectionDate", 30010)

    VERIFIED = ErrorCode("userVerified", 50000, True)
    PROCESSING_ERROR = ErrorCode("processingError", 60000, True)

    # media comment codes (AssertionCodes.scala:128-129) — user-facing
    # media-representativeness flags, category Comment in the reference
    MEDIA_REPRESENTATIVE = ErrorCode("mediaRepresentative", 70000)
    MEDIA_UNREPRESENTATIVE = ErrorCode("mediaUnrepresentative", 70001)

    # alias preserving the reference's attribute name (its own typo,
    # AssertionCodes.scala:46 MISSING_GEOREFERNCEDBY) so lookups written
    # against the reference keep working; same ErrorCode object
    MISSING_GEOREFERNCEDBY = MISSING_GEOREFERENCEDBY

    GEOSPATIAL_BOUNDS = (0, 10000)
    TAXONOMIC_BOUNDS = (10000, 20000)
    MISCELLANEOUS_BOUNDS = (20000, 30000)
    TEMPORAL_BOUNDS = (30000, 40000)

    # codes that make a record geospatially non-kosher
    # (AssertionCodes.scala:160)
    GEOSPATIAL_KOSHER_CODES = frozenset(
        c.code
        for c in (
            GEOSPATIAL_ISSUE,
            TAXONOMIC_ISSUE,
            ZERO_COORDINATES,
            COORDINATES_OUT_OF_RANGE,
            DECIMAL_LAT_LONG_CONVERSION_FAILED,
            DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED,
            DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED,
        )
    )


_QA_INTERN: dict = {}


@dataclass(frozen=True)
class QualityAssertion:
    code: int
    name: str
    qa_status: int = FAILED
    comment: str = ""

    # commentless assertions are interned: they are frozen constants and the
    # chain allocates tens per record (hot in the mapInPandas profile)
    @classmethod
    def _interned(cls, ec: ErrorCode, status: int) -> "QualityAssertion":
        key = (ec.code, status)
        qa = _QA_INTERN.get(key)
        if qa is None:
            qa = _QA_INTERN[key] = cls(ec.code, ec.name, status, "")
        return qa

    @classmethod
    def failed(cls, ec: ErrorCode, comment: str = "") -> "QualityAssertion":
        if not comment:
            return cls._interned(ec, FAILED)
        return cls(ec.code, ec.name, FAILED, comment)

    @classmethod
    def passed(cls, ec: ErrorCode) -> "QualityAssertion":
        return cls._interned(ec, PASSED)

    @classmethod
    def unchecked(cls, ec: ErrorCode) -> "QualityAssertion":
        return cls._interned(ec, UNCHECKED)

    def as_tuple(self) -> tuple[int, str, int, str]:
        return (self.code, self.name, self.qa_status, self.comment)


def is_geospatially_kosher_codes(codes) -> bool:
    """Code-array form of the kosher test (AssertionCodes.scala:191-195,
    behaviors pinned by AssertionCodeTest.scala): kosher unless any code
    is in the gating set — status is not consulted in this form."""
    return not any(c in AssertionCodes.GEOSPATIAL_KOSHER_CODES for c in codes)


def geospatially_kosher(assertions: list[QualityAssertion]) -> bool:
    """False when any failed assertion is in the kosher-gating set
    (dao/OccurrenceDAOImpl — geospatiallyKosher flag)."""
    return not any(
        a.qa_status == FAILED and a.code in AssertionCodes.GEOSPATIAL_KOSHER_CODES
        for a in assertions
    )


def append_assertion(df, assertion_col):
    """Null-safe append of one assertion struct to the `assertions`
    array, creating the column when absent — THE shared helper for every
    enrichment stage that adds an assertion outside the chain pass.
    coalesce matters: concat(NULL, x) is NULL, so a row whose assertions
    column is null would otherwise silently LOSE the new assertion."""
    from pyspark.sql import functions as F

    if "assertions" in df.columns:
        existing = F.coalesce(
            F.col("assertions"),
            F.array().cast(df.schema["assertions"].dataType),
        )
        return df.withColumn(
            "assertions", F.concat(existing, F.array(assertion_col))
        )
    return df.withColumn("assertions", F.array(assertion_col))
