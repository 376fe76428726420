"""Ad-hoc CSV column guessing (the sandbox upload path).

Port of parser/AdHocParser.scala:182-280: when a user uploads a CSV with
unknown or missing headers, guess each column's DwC term — first by
matching the header strings against the DwC vocabulary, and when that
fails (or the first line looks like data), by content-sniffing the first
row's values through an extractor ladder (datum vocab, image URL, basis of
record, type status, date, grid reference, decimal/verbatim coordinates,
country/state, occurrenceID, catalogue number, life stage, sex,
coordinate uncertainty, scientific/common name).

Pure-Python helpers (driver-side: header guessing happens once per upload,
never per record); the guessed header list then feeds the normal DwC CSV
loader path.
"""

from __future__ import annotations

import re

from biocache_store_spark.parsers import latlon as latlon_parser
from biocache_store_spark.parsers.dates import parse_date
from biocache_store_spark.parsers.gridref import grid_reference_to_easting_northing
from biocache_store_spark.parsers.vocab import (
    BASIS_OF_RECORD,
    LIFE_STAGE,
    OCCURRENCE_STATUS,
    SEX,
    TYPE_STATUS,
)
from biocache_store_spark.sources.dwc_terms import match_term

_IMAGE_URL = re.compile(
    r"^https?://(?:[a-zA-Z0-9\-]+\.)+[a-zA-Z]{2,6}(?:/[^/#]+)+\.(?:jpg|gif|png|jpeg)$",
    re.IGNORECASE,
)
_DATUMS = {"wgs84", "wgs 84", "epsg:4326", "gda94", "gda 94", "agd66", "agd84",
           "nad27", "nad83", "osgb36", "ed50", "tokyo", "nzgd49", "nzgd2000"}
_CATALOG = re.compile(r"[A-Za-z]+-?[0-9]+")
_COUNTRIES = {"australia", "new zealand", "united kingdom", "united states",
              "indonesia", "papua new guinea", "mongolia"}
_STATES = {"new south wales", "nsw", "victoria", "vic", "queensland", "qld",
           "south australia", "western australia", "tasmania",
           "northern territory", "australian capital territory", "act",
           "england", "scotland", "wales", "northern ireland"}
_UNCERTAINTY = re.compile(r"^\d+(\.\d+)?\s*(m|km|meters|metres|kilometers|kilometres)$", re.IGNORECASE)
_SCI_NAME = re.compile(r"^[A-Z][a-z]+ [a-z]{3,}( [a-z]{3,})?$")
_COMMON_NAME = re.compile(r"^[A-Za-z][a-z]+( [A-Za-z][a-z]+){1,3}$")


def _is_decimal(s: str) -> float | None:
    try:
        return float(s)
    except ValueError:
        return None


def guess_value_term(value: str | None) -> str:
    """AdHocParser.parse(value) (:252-280): the extractor ladder — best
    DwC term for one raw value, "" when nothing matches."""
    if value is None:
        return ""
    v = value.strip()
    if not v:
        return ""
    if v.lower() in _DATUMS:
        return "geodeticDatum"
    if _IMAGE_URL.fullmatch(v):
        return "associatedMedia"
    if BASIS_OF_RECORD.match_term(v) is not None:
        return "basisOfRecord"
    if TYPE_STATUS.match_term(v) is not None:
        return "typeStatus"
    if parse_date(v) is not None:
        return "eventDate"
    if grid_reference_to_easting_northing(v) is not None:
        return "gridReference"
    d = _is_decimal(v)
    if d is not None and "." in v:
        if -90 <= d <= 90:
            return "decimalLatitude"
        if -180 <= d <= 180:
            return "decimalLongitude"
    if d is None and latlon_parser.parse(v) is not None:
        # parse_with_direction returns ('lat'|'lon') from the N/S/E/W
        # suffix (VerbatimLatitudeExtractor/VerbatimLongitudeExtractor,
        # AdHocParser.scala:429-441)
        parsed, direction = latlon_parser.parse_with_direction(v)
        if direction == "lon":
            return "verbatimLongitude"
        return "verbatimLatitude"
    if v.lower() in _COUNTRIES:
        return "country"
    if v.lower() in _STATES:
        return "stateProvince"
    if v.startswith("urn:") or v.startswith("http://") or v.startswith("https://"):
        return "occurrenceID"
    if LIFE_STAGE.match_term(v) is not None:
        return "lifeStage"
    if SEX.match_term(v) is not None:
        return "sex"
    if _UNCERTAINTY.fullmatch(v):
        return "coordinateUncertaintyInMeters"
    if _SCI_NAME.fullmatch(v):
        return "scientificName"
    if OCCURRENCE_STATUS.match_term(v) is not None:
        return "occurrenceStatus"
    if _CATALOG.fullmatch(v):
        return "catalogNumber"
    if _COMMON_NAME.fullmatch(v):
        return "vernacularName"
    return ""


def _parse_head(col1: str, col2: str) -> tuple[str, str] | None:
    """AdHocParser.parseHead (:243-249): special-case the leading columns."""
    d1, d2 = _is_decimal(col1), _is_decimal(col2)
    if d1 is not None and -90 <= d1 <= 90 and d2 is not None and -90 <= d2 <= 90:
        return ("decimalLatitude", "decimalLongitude")
    if col1.isdigit():
        return ("recordNumber", "")
    if col1.startswith("urn") or col1.startswith("http://"):
        return ("occurrenceID", "")
    return None


def guess_column_headers(values: list[str]) -> list[str]:
    """AdHocParser.guessColumnHeaders (:182-241): try the row as DwC
    headers; when too few match — the row is data — content-sniff each
    value, apply the leading-column special cases, and resolve a
    duplicated sequential decimalLatitude pair to (lat, long)."""
    matched = [match_term(v) or "" for v in values]
    n_matched = sum(1 for m in matched if m)
    if not (n_matched > 4 or (n_matched / max(len(values), 1)) < 0.25):
        return matched

    guessed = [guess_value_term(v) for v in values]
    if len(values) > 1:
        head = _parse_head(values[0].strip(), values[1].strip())
        if head is not None:
            col1, col2 = head
            if col1 and col2:
                guessed[0], guessed[1] = col1, col2
            elif col1:
                guessed[0] = col1

    # duplicated decimalLatitude: a sequential pair becomes (lat, long)
    lat_idx = [i for i, g in enumerate(guessed) if g == "decimalLatitude"]
    if len(lat_idx) > 1:
        for i, j in zip(lat_idx, lat_idx[1:]):
            if j == i + 1:
                guessed[i], guessed[j] = "decimalLatitude", "decimalLongitude"
                break
    return guessed
