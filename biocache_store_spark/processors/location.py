"""LocationProcessor — coordinate resolution and validation.

Port of processor/LocationProcessor.scala:
  * processLatLong precedence (decimal -> verbatim DMS -> easting/northing ->
    grid ref) — :369-407
  * processDecimalCoordinates datum handling — :418-486
  * validateCoordinatesValues (range, inverted, zero, country-bbox negation)
    — :792-891
  * checkCoordinateUncertainty (uncertainty parse, precision/uncertainty
    swap) — :570-643

Datum handling: a datum->EPSG registry recognizes the common datums and
parsers/gridref.py reprojects them to WGS84 with the published Helmert
parameters (GISUtil.reprojectCoordinatesToWGS84 semantics,
util/GISUtil.scala:27-60): AGD66/AGD84 (ICSM national parameters), OSGB36,
ED50, NAD27, Tokyo; GRS80-based datums (GDA94/GDA2020/NAD83/ETRS89) are a
null transform. Results are rounded to min(dp(lat), dp(lon)) like the
reference (LocationProcessor.scala:459-466). OSGB/Irish grid references are
fully converted, and easting/northing+zone triples go through the UTM/MGA
inverse transverse Mercator in parsers/utm.py
(GridUtil.processNorthingEastingZone, GridUtil.scala:573-620).
"""

from __future__ import annotations

from biocache_store_spark.parsers import distance as distance_parser
from biocache_store_spark.parsers import latlon as latlon_parser
from biocache_store_spark.parsers.vocab import Vocab
from biocache_store_spark.processors.assertions import (
    AssertionCodes as C,
)
from biocache_store_spark.processors.assertions import QualityAssertion as QA

WGS84_EPSG = "EPSG:4326"

# variant lists mirror the reference's datums.txt vocabulary
# (src/main/resources/datums.txt; vocab/GeodeticDatum)
GEODETIC_DATUM = Vocab.of(
    {
        "WGS84": [
            "wgs 84", "wgs-84", "world geodetic system", "world geodetic system 1984",
            "wgs84/gda94", "ws84", "wsg84", "wgsa84", "wgss84", "wgs1984",
            "epsg 4326", "epsg4326", "4326",
        ],
        "GDA94": [
            "gda 94", "gd94", "gda", "dga94", "agd94",
            "geocentric datum of australia 1994", "epsg 4283", "4283",
        ],
        "GDA2020": ["gda 2020", "epsg 7844", "7844"],
        "AGD66": [
            "agd 66", "amg", "agm", "add66", "adg66", "ags1966", "ags66",
            "agm66", "amg66", "australian geodetic datum 1966", "epsg 4202", "4202",
        ],
        "AGD84": [
            "agd 84", "agd 1984", "agd84/66", "adg84", "augs84", "aus84",
            "australian geodetic datum 1984", "epsg 4203", "4203",
        ],
        "NAD27": ["nad 27", "north american datum 1927", "epsg 4267", "4267"],
        "NAD83": ["nad 83", "epsg 4269", "4269"],
        "NZGD49": ["nzgd1949", "nzmg", "nzgd 49", "epsg 4272", "4272"],
        "ETRS89": ["etrs 89", "epsg 4258", "4258"],
        "ED50": ["european 1950", "european datum 1950", "epsg 4230", "4230"],
        "TOKYO": ["tokyo datum", "epsg 4301", "4301"],
        "OSGB36": ["osgb 36", "osgb 1936", "epsg 4277", "4277"],
    }
)

_EPSG_CODES = {
    "WGS84": "EPSG:4326",
    "GDA94": "EPSG:4283",
    "GDA2020": "EPSG:7844",
    "AGD66": "EPSG:4202",
    "AGD84": "EPSG:4203",
    "NAD27": "EPSG:4267",
    "NAD83": "EPSG:4269",
    "NZGD49": "EPSG:4272",
    "ETRS89": "EPSG:4258",
    "ED50": "EPSG:4230",
    "TOKYO": "EPSG:4301",
    "OSGB36": "EPSG:4277",
}

def _decimal_places(s) -> int:
    """getNumberOfDecimalPlacesInDouble (LocationProcessor.scala:561-568)."""
    tokens = str(s).split(".")
    return len(tokens[1]) if len(tokens) == 2 else 0

# country -> ((centre_lat, centre_lon), (min_lat, min_lon, max_lat, max_lon))
# public approximate bounds; extendable via external dim table
COUNTRY_CENTRES = {
    "australia": ((-29.5328037, 145.491477), (-43.8, 112.9, -9.1, 153.7)),
    "new zealand": ((-41.5000831, 172.8344077), (-47.5, 166.3, -34.1, 178.6)),
    "united kingdom": ((54.3781, -3.4360), (49.8, -8.7, 60.9, 1.8)),
    "united states": ((39.7837304, -100.445882), (24.4, -125.0, 49.4, -66.9)),
}

# state/territory centre points + bbox (stateProvinceCentrePoints.txt:
# name, centre lat, centre lon, ne lat, ne lon, sw lat, sw lon)
STATE_CENTRES = {
    "australian capital territory": (-35.4734679, 149.0123679),
    "new south wales": (-31.2532183, 146.921099),
    "victoria": (-37.4713077, 144.7851531),
    "tasmania": (-41.3650419, 146.6284905),
    "western australia": (-27.6728168, 121.6283098),
    "queensland": (-20.9175738, 142.7027956),
    "south australia": (-30.0002315, 136.2091547),
    "northern territory": (-19.4914108, 132.5509603),
}

# country centres for the centre-point test (countryCentrePoints.txt subset —
# the countries this engine's vocab recognises)
COUNTRY_CENTRE_POINTS = {
    "australia": (-25.274398, 133.775136),
    "new zealand": (-40.900557, 174.885971),
    "united kingdom": (55.378051, -3.435973),
    "united states": (37.09024, -95.712891),
    "mongolia": (46.862496, 103.846656),
    "indonesia": (-0.789275, 113.921327),
    "papua new guinea": (-6.314993, 143.95555),
}

# stateProvinces.txt vocabulary
STATE_PROVINCES = Vocab.of(
    {
        "Australian Capital Territory": [
            "austcapitalterritory", "austcapitalterrit", "auscap", "auscapterrit",
            "act", "jervis bay territory", "australian captial territory",
        ],
        "New South Wales": ["nswales", "nsw", "new south wales (including coastal waters)"],
        "Northern Territory": ["nterritory", "nterrit", "nt", "northern territory (including coastal waters)"],
        "Queensland": ["qland", "qld", "queensland (including coastal waters)"],
        "South Australia": ["sthaustralia", "saustralia", "saust", "sa", "south australia (including coastal waters)"],
        "Tasmania": ["tassie", "tas", "tasmania (including coastal waters)"],
        "Victoria": ["vic", "vict", "victoria (including coastal waters)"],
        "Western Australia": ["waustralia", "westaustralia", "westaust", "wa", "western australia (including coastal waters)"],
    }
)

# stateProvince2Countries.txt
STATE_TO_COUNTRY = {
    "Australian Capital Territory": "Australia",
    "New South Wales": "Australia",
    "Northern Territory": "Australia",
    "Queensland": "Australia",
    "South Australia": "Australia",
    "Tasmania": "Australia",
    "Victoria": "Australia",
    "Western Australia": "Australia",
}

# vocab/HabitatMap.scala termMap
HABITAT_MAP = {
    "MARINE": ["MARINE", "MARINE AND NON-MARINE"],
    "NON-MARINE": ["NON-MARINE", "TERRESTRIAL", "LIMNETIC", "MARINE AND NON-MARINE"],
    "TERRESTRIAL": ["NON-MARINE", "TERRESTRIAL", "LIMNETIC", "MARINE AND NON-MARINE"],
    "LIMNETIC": ["NON-MARINE", "TERRESTRIAL", "LIMNETIC", "MARINE AND NON-MARINE"],
}


def habitats_compatible(term: str | None, terms: list[str] | None) -> bool | None:
    """VocabMaps.areTermsCompatible (vocab/VocabMaps.scala:26-69): None if
    the biome term is unrecognised, else whether any species habitat is
    compatible."""
    if term is None or not terms:
        return None
    tested = None
    for other in terms:
        if other is None:
            continue
        if term.upper() == other.upper():
            return True
        mapped = HABITAT_MAP.get(term.upper())
        if mapped is None:
            continue
        if other.upper() in mapped:
            return True
        tested = False
    return tested

COUNTRIES = Vocab.of(
    {
        "Australia": ["aus", "au", "commonwealth of australia"],
        "New Zealand": ["nz", "aotearoa"],
        "United Kingdom": ["uk", "great britain", "gb", "england scotland wales"],
        "United States": ["usa", "us", "united states of america"],
        "Mongolia": [],
        "Indonesia": [],
        "Papua New Guinea": ["png"],
    }
)


def _to_float(s):
    """Scala toFloatWithOption analog. Python's float() additionally
    accepts underscore separators ('1_5' -> 15.0) which Scala rejects —
    those must parse as None or a garbled coordinate silently becomes a
    valid number. ('NaN'/'Infinity' parse in BOTH languages; that
    reference-shared quirk is preserved.)"""
    try:
        if s is None:
            return None
        text = str(s).strip()
        if text == "" or "_" in text:
            return None
        return float(text)
    except ValueError:
        return None


def _float32_repr(value: float) -> str:
    """Scala Float.toString analog: the shortest decimal string that
    round-trips through float32 (verbatim-derived coordinates pass through
    Float in the reference)."""
    import numpy as _np

    return _np.format_float_positional(
        _np.float32(value), unique=True, trim="-"
    )


def process_lat_long(raw: dict, assertions: list) -> dict | None:
    """processLatLong (LocationProcessor.scala:369-407). Returns
    {latitude, longitude, datum} (strings) or None."""
    lat = raw.get("decimalLatitude")
    lon = raw.get("decimalLongitude")
    if _to_float(lat) is not None and _to_float(lon) is not None:
        return _process_decimal(lat, lon, raw.get("geodeticDatum"), raw.get("verbatimSRS"), assertions)

    assertions.append(QA.failed(C.DECIMAL_COORDINATES_NOT_SUPPLIED))
    vlat, vlon = raw.get("verbatimLatitude"), raw.get("verbatimLongitude")
    if vlat is not None and vlon is not None:
        dlat = _to_float(vlat)
        dlon = _to_float(vlon)
        if dlat is None or dlon is None:
            dlat = latlon_parser.parse(str(vlat))
            dlon = latlon_parser.parse(str(vlon))
        if dlat is not None and dlon is not None:
            assertions.append(QA.failed(C.DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM))
            # the reference parses verbatim coordinates into Float
            # (LocationProcessor.scala:497-545 — Option[Float]), so the
            # stored string is the shortest float32 representation
            # ("22.04889", not "22.0488888")
            return {
                "latitude": _float32_repr(dlat),
                "longitude": _float32_repr(dlon),
                "datum": WGS84_EPSG,
            }
        assertions.append(
            QA.failed(
                C.DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED,
                "Failed to calculate decimal latitude/longitude from verbatim",
            )
        )
        return None
    if raw.get("easting") is not None and raw.get("northing") is not None and raw.get("zone") is not None:
        # GridUtil.processNorthingEastingZone (GridUtil.scala:573-620):
        # verbatimSRS|zone -> projected CRS (default GDA94/MGA), inverse
        # transverse Mercator + Helmert, rounded to 5 decimals
        from biocache_store_spark.parsers.utm import easting_northing_zone_to_wgs84

        easting = _to_float(raw.get("easting"))
        northing = _to_float(raw.get("northing"))
        if easting is not None and northing is not None:
            point = easting_northing_zone_to_wgs84(
                easting, northing, str(raw["zone"]), raw.get("verbatimSRS")
            )
            if point is not None:
                assertions.append(QA.passed(C.DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED))
                assertions.append(
                    QA.failed(
                        C.DECIMAL_LAT_LONG_CALCULATED_FROM_EASTING_NORTHING,
                        "Decimal latitude and longitude were calculated using easting, northing and zone.",
                    )
                )
                return {
                    "latitude": str(point[0]),
                    "longitude": str(point[1]),
                    "datum": WGS84_EPSG,
                }
            srs = raw.get("verbatimSRS")
            assertions.append(
                QA.failed(
                    C.DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED,
                    "Unrecognized zone GDA94 / MGA zone " + str(raw["zone"])
                    if srs is None
                    else "Unrecognized zone " + str(srs) + " / zone " + str(raw["zone"]),
                )
            )
        return None
    if raw.get("gridReference") is not None:
        from biocache_store_spark.parsers.gridref import process_grid_reference

        point = process_grid_reference(str(raw["gridReference"]))
        if point is not None:
            assertions.append(QA.failed(C.DECIMAL_LAT_LONG_CALCULATED_FROM_GRID_REF))
            return {
                "latitude": str(point.latitude),
                "longitude": str(point.longitude),
                "datum": point.datum,
                "uncertainty": point.coordinate_uncertainty,
            }
        assertions.append(
            QA.failed(
                C.DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED,
                "Invalid grid reference",
            )
        )
        return None
    return None


def _process_decimal(lat, lon, datum, verbatim_srs, assertions):
    """processDecimalCoordinates (LocationProcessor.scala:418-486)."""
    assertions.append(QA.passed(C.DECIMAL_COORDINATES_NOT_SUPPLIED))
    if datum is not None and str(datum).strip() != "":
        assertions.append(QA.passed(C.GEODETIC_DATUM_ASSUMED_WGS84))
        term = GEODETIC_DATUM.match_term(str(datum))
        canonical = term.canonical if term else str(datum)
        epsg = _EPSG_CODES.get(canonical)
        if epsg is None and verbatim_srs:
            vterm = GEODETIC_DATUM.match_term(str(verbatim_srs))
            if vterm:
                epsg = _EPSG_CODES.get(vterm.canonical)
        if epsg is not None:
            assertions.append(QA.passed(C.UNRECOGNIZED_GEODETIC_DATUM))
            if epsg == WGS84_EPSG:
                return {"latitude": str(lat), "longitude": str(lon), "datum": WGS84_EPSG}
            from biocache_store_spark.parsers.gridref import (
                reproject_geographic_to_wgs84,
            )

            decimals = min(_decimal_places(lat), _decimal_places(lon))
            reprojected = reproject_geographic_to_wgs84(
                _to_float(lat), _to_float(lon), epsg, decimals
            )
            if reprojected is None:
                assertions.append(
                    QA.failed(
                        C.DECIMAL_LAT_LONG_CONVERSION_FAILED,
                        "Transformation of decimal latitude and longitude to WGS84 failed",
                    )
                )
                return None
            assertions.append(QA.passed(C.DECIMAL_LAT_LONG_CONVERSION_FAILED))
            assertions.append(
                QA.failed(
                    C.DECIMAL_LAT_LONG_CONVERTED,
                    "Decimal latitude and longitude were converted to WGS84 (EPSG:4326)",
                )
            )
            return {
                "latitude": str(reprojected[0]),
                "longitude": str(reprojected[1]),
                "datum": WGS84_EPSG,
            }
        assertions.append(
            QA.failed(C.UNRECOGNIZED_GEODETIC_DATUM, f"Geodetic datum {datum} not recognized.")
        )
        return {"latitude": str(lat), "longitude": str(lon), "datum": None}
    assertions.append(
        QA.failed(C.GEODETIC_DATUM_ASSUMED_WGS84, "Geodetic datum assumed to be WGS84 (EPSG:4326)")
    )
    return {"latitude": str(lat), "longitude": str(lon), "datum": WGS84_EPSG}


def validate_coordinates(raw: dict, processed: dict, assertions: list) -> None:
    """validateCoordinatesValues (LocationProcessor.scala:792-891).
    Mutates processed[decimalLatitude/decimalLongitude]."""
    lat = _to_float(processed.get("decimalLatitude"))
    lon = _to_float(processed.get("decimalLongitude"))
    if lat is None or lon is None:
        return

    if lat < -90 or lat > 90 or lon < -180 or lon > 180:
        if -90 <= lon <= 90 and -180 <= lat <= 180:
            assertions.append(
                QA.failed(
                    C.INVERTED_COORDINATES,
                    "Assume that coordinates have been inverted. Original values: "
                    f"{processed.get('decimalLatitude')},{processed.get('decimalLongitude')}",
                )
            )
            processed["decimalLatitude"], processed["decimalLongitude"] = (
                processed.get("decimalLongitude"),
                processed.get("decimalLatitude"),
            )
            lat, lon = lon, lat
            assertions.append(QA.passed(C.COORDINATES_OUT_OF_RANGE))
        else:
            assertions.append(
                QA.failed(
                    C.COORDINATES_OUT_OF_RANGE,
                    "Coordinates are out of range: "
                    f"{processed.get('decimalLatitude')},{processed.get('decimalLongitude')}",
                )
            )
            assertions.append(QA.passed(C.INVERTED_COORDINATES))
    else:
        assertions.append(QA.passed(C.INVERTED_COORDINATES))
        assertions.append(QA.passed(C.COORDINATES_OUT_OF_RANGE))

    if lat == 0.0 and lon == 0.0:
        assertions.append(QA.failed(C.ZERO_COORDINATES, "Coordinates 0,0"))
        processed["decimalLatitude"] = None
        processed["decimalLongitude"] = None
    else:
        assertions.append(QA.passed(C.ZERO_COORDINATES))

    assertions.append(
        QA.failed(C.ZERO_LATITUDE_COORDINATES, "Latitude 0,0")
        if lat == 0.0
        else QA.passed(C.ZERO_LATITUDE_COORDINATES)
    )
    assertions.append(
        QA.failed(C.ZERO_LONGITUDE_COORDINATES, "Longitude 0,0")
        if lon == 0.0
        else QA.passed(C.ZERO_LONGITUDE_COORDINATES)
    )

    country_raw = raw.get("country")
    if country_raw:
        country = COUNTRIES.match_term(str(country_raw))
        if country is None:
            assertions.append(
                QA.failed(C.UNKNOWN_COUNTRY_NAME, f"Country name '{country_raw}' not recognised.")
            )
            return
        assertions.append(QA.passed(C.UNKNOWN_COUNTRY_NAME))
        entry = COUNTRY_CENTRES.get(country.canonical.lower())
        if entry is None:
            return
        _, bbox = entry

        def contains(la, lo):
            return bbox[0] <= la <= bbox[2] and bbox[1] <= lo <= bbox[3]

        # only SINGLE-axis negations are tested, never the both-negated
        # combination — mirroring LocationProcessor.scala:855-874 exactly;
        # a fully sign-flipped point stays a COUNTRY_COORDINATE_MISMATCH
        if not contains(lat, lon):
            mismatch = True
            if contains(-lat, lon):
                assertions.append(
                    QA.failed(
                        C.NEGATED_LATITUDE,
                        f"Latitude seems to be negated. Original value:{processed.get('decimalLatitude')}",
                    )
                )
                processed["decimalLatitude"] = str(-lat)
                mismatch = False
            if contains(lat, -lon):
                assertions.append(
                    QA.failed(
                        C.NEGATED_LONGITUDE,
                        f"Longitude seems to be negated. Original value: {processed.get('decimalLongitude')}",
                    )
                )
                processed["decimalLongitude"] = str(-lon)
                mismatch = False
            if mismatch:
                assertions.append(QA.failed(C.COUNTRY_COORDINATE_MISMATCH))
            else:
                assertions.append(QA.passed(C.COUNTRY_COORDINATE_MISMATCH))


def check_coordinate_uncertainty(raw: dict, processed: dict, assertions: list) -> None:
    """checkCoordinateUncertainty (LocationProcessor.scala:570-643)."""
    checked_precision = False
    unc = raw.get("coordinateUncertaintyInMeters")
    if unc is not None and str(unc) != "":
        parsed = distance_parser.parse(str(unc))
        if parsed is not None:
            value, _unit = parsed
            if value > 0:
                assertions.append(QA.passed(C.UNCERTAINTY_RANGE_MISMATCH))
            else:
                assertions.append(
                    QA.failed(
                        C.UNCERTAINTY_RANGE_MISMATCH,
                        f"Supplied uncertainty, {unc}, is not a supported format",
                    )
                )
            # REFERENCE PARITY (LocationProcessor.scala:585): the parsed
            # value is stored even when <= 0 (the range assertion above
            # already failed) — the reference assigns unconditionally
            processed["coordinateUncertaintyInMeters"] = f"{value:.1f}"
        else:
            assertions.append(
                QA.failed(
                    C.UNCERTAINTY_RANGE_MISMATCH,
                    f"Supplied uncertainty, {unc}, is not a supported format",
                )
            )
    else:
        precision = raw.get("coordinatePrecision")
        if precision is not None:
            value = _to_float(precision)
            if value is not None and value > 1:
                processed["coordinateUncertaintyInMeters"] = str(int(value))
                assertions.append(
                    QA.failed(
                        C.UNCERTAINTY_IN_PRECISION,
                        f"Supplied precision, {precision}, is assumed to be uncertainty in metres",
                    )
                )
                checked_precision = True

    precision = raw.get("coordinatePrecision")
    if precision is None or str(precision).strip() == "":
        assertions.append(QA.failed(C.MISSING_COORDINATEPRECISION, "Missing coordinatePrecision"))
    else:
        assertions.append(QA.passed(C.MISSING_COORDINATEPRECISION))
        if not checked_precision:
            value = _to_float(precision)
            if value is not None:
                if 0 < value <= 1:
                    assertions.append(QA.passed(C.PRECISION_RANGE_MISMATCH))
                    pre = len(str(precision).split(".")[1]) if "." in str(precision) else 0
                    lat = processed.get("decimalLatitude") or ""
                    lon = processed.get("decimalLongitude") or ""
                    latp = len(lat.split(".")[1]) if "." in lat else 0
                    lonp = len(lon.split(".")[1]) if "." in lon else 0
                    if pre == latp and pre == lonp:
                        assertions.append(QA.passed(C.COORDINATE_PRECISION_MISMATCH))
                    else:
                        assertions.append(QA.failed(C.COORDINATE_PRECISION_MISMATCH))
                else:
                    assertions.append(
                        QA.failed(
                            C.PRECISION_RANGE_MISMATCH,
                            "Coordinate precision is not between 0 and 1",
                        )
                    )
            else:
                assertions.append(
                    QA.failed(C.PRECISION_RANGE_MISMATCH, "Unable to parse the coordinate precision")
                )

    if processed.get("coordinateUncertaintyInMeters") is None:
        assertions.append(QA.failed(C.UNCERTAINTY_NOT_SPECIFIED, "Uncertainty was not supplied"))
    else:
        assertions.append(QA.passed(C.UNCERTAINTY_NOT_SPECIFIED))


def _float32_decimal_places(value: float) -> int:
    """CentrePoints.noOfDecimalPlace (vocab/CentrePoints.scala:89-97):
    decimal places of the FLOAT's string form (float32 shortest repr)."""
    import numpy as np

    s = str(np.float32(value))
    return len(s.split(".")[1]) if "." in s else 0


def _centre_round(value: float, decimals: int) -> float:
    """CentrePoints.round (vocab/CentrePoints.scala:79-87): float32
    TRUNCATION at dp>0 (toInt), half-up rounding at dp=0."""
    import numpy as np

    v = np.float32(value)
    if decimals > 0:
        x = 10**decimals
        return float(np.float32(np.float32(int(np.float32(v * x))) / x))
    return float(np.floor(v + 0.5))


def coordinates_match_centre(
    centre: tuple[float, float] | None, lat_s, lon_s
) -> bool:
    """CentrePoints.coordinatesMatchCentre (vocab/CentrePoints.scala:19-53):
    the centre point, truncated to the supplied coordinates' decimal
    places, equals the supplied coordinates."""
    if centre is None or lat_s is None or lon_s is None:
        return False
    import numpy as np

    try:
        lat = float(np.float32(str(lat_s)))
        lon = float(np.float32(str(lon_s)))
    except ValueError:
        return False
    lat_dp = _float32_decimal_places(lat)
    lon_dp = _float32_decimal_places(lon)
    return (
        _centre_round(centre[0], lat_dp) == np.float32(lat)
        and _centre_round(centre[1], lon_dp) == np.float32(lon)
    )


def process_state_country_values(raw: dict, processed: dict) -> None:
    """processStateCountryValues (LocationProcessor.scala:137-165): only
    when no coordinates were supplied, canonicalize the raw state (and
    infer its country via StateProvinceToCountry) and the raw country /
    countryCode."""
    no_coords = raw.get("decimalLatitude") is None and raw.get("decimalLongitude") is None
    if processed.get("stateProvince") is None and no_coords:
        term = STATE_PROVINCES.match_term(str(raw.get("stateProvince") or ""))
        if term:
            processed["stateProvince"] = term.canonical
            processed["country"] = STATE_TO_COUNTRY.get(term.canonical, "")
    if processed.get("country") is None and no_coords:
        term = COUNTRIES.match_term(str(raw.get("country") or ""))
        if term:
            processed["country"] = term.canonical
    if processed.get("country") is None and raw.get("countryCode") is not None:
        term = COUNTRIES.match_term(str(raw["countryCode"]))
        if term:
            processed["country"] = term.canonical


def validate_centre_points(raw: dict, processed: dict, assertions: list) -> None:
    """validateCoordinates (LocationProcessor.scala:192-212): country
    inferred from coordinates + state/country centre-point tests."""
    if raw.get("country") is None and processed.get("country") is not None:
        assertions.append(QA.failed(C.COUNTRY_INFERRED_FROM_COORDINATES))
    else:
        assertions.append(QA.passed(C.COUNTRY_INFERRED_FROM_COORDINATES))

    state = processed.get("stateProvince")
    state_term = STATE_PROVINCES.match_term(str(state)) if state else None
    centre = STATE_CENTRES.get(state_term.canonical.lower()) if state_term else None
    if coordinates_match_centre(centre, raw.get("decimalLatitude"), raw.get("decimalLongitude")):
        assertions.append(
            QA.failed(
                C.COORDINATES_CENTRE_OF_STATEPROVINCE,
                f"Coordinates are centre point of {state}",
            )
        )
    else:
        assertions.append(QA.passed(C.COORDINATES_CENTRE_OF_STATEPROVINCE))

    country = processed.get("country")
    country_term = COUNTRIES.match_term(str(country)) if country else None
    ccentre = (
        COUNTRY_CENTRE_POINTS.get(country_term.canonical.lower()) if country_term else None
    )
    if coordinates_match_centre(ccentre, raw.get("decimalLatitude"), raw.get("decimalLongitude")):
        assertions.append(
            QA.failed(
                C.COORDINATES_CENTRE_OF_COUNTRY,
                f"Coordinates are centre point of {country}",
            )
        )
    else:
        assertions.append(QA.passed(C.COORDINATES_CENTRE_OF_COUNTRY))


def check_state_mismatch(raw: dict, processed: dict, assertions: list) -> None:
    """checkForStateMismatch (LocationProcessor.scala:727-748)."""
    if processed.get("stateProvince") is not None and raw.get("stateProvince") is not None:
        term = STATE_PROVINCES.match_term(str(raw["stateProvince"]))
        if term and processed["stateProvince"].lower() != term.canonical.lower():
            assertions.append(
                QA.failed(
                    C.STATE_COORDINATE_MISMATCH,
                    f"Supplied: {term.canonical}, calculated: {processed['stateProvince']}",
                )
            )
        else:
            assertions.append(QA.passed(C.STATE_COORDINATE_MISMATCH))
    else:
        assertions.append(QA.unchecked(C.STATE_COORDINATE_MISMATCH))


def check_biome_mismatch(
    processed: dict, species_habitats: list[str] | None, assertions: list
) -> None:
    """checkForBiomeMismatch (LocationProcessor.scala:652-696): the biome
    derived from the point's layers vs the taxon-profile habitats."""
    biome = processed.get("biome")
    if biome is None:
        assertions.append(QA.unchecked(C.COORDINATE_HABITAT_MISMATCH))
        return
    if species_habitats:
        compatible = habitats_compatible(biome, species_habitats)
        if compatible is not None:
            if not compatible:
                assertions.append(
                    QA.failed(
                        C.COORDINATE_HABITAT_MISMATCH,
                        "Recognised habitats for species: "
                        + ",".join(species_habitats)
                        + f", Value determined from coordinates: {biome}",
                    )
                )
            else:
                assertions.append(QA.passed(C.COORDINATE_HABITAT_MISMATCH))
    else:
        assertions.append(QA.unchecked(C.COORDINATE_HABITAT_MISMATCH))


def process_altitude_depth(raw: dict, processed: dict, assertions: list) -> None:
    """processAltitudeAndDepth (LocationProcessor.scala:216-310): verbatim
    depth/elevation parsing + range/unit QAs + min/max reversal."""
    if raw.get("verbatimDepth") is not None:
        parsed = distance_parser.parse(str(raw["verbatimDepth"]))
        if parsed is not None:
            depth, unit = parsed
            processed["verbatimDepth"] = str(depth)
            if depth > 10000:
                assertions.append(
                    QA.failed(C.DEPTH_OUT_OF_RANGE, f"Depth {depth} is greater than 10,000 metres")
                )
            else:
                assertions.append(QA.passed(C.DEPTH_OUT_OF_RANGE))
            assertions.append(QA.passed(C.DEPTH_NON_NUMERIC))
            if unit == "feet":
                assertions.append(
                    QA.failed(
                        C.DEPTH_IN_FEET,
                        "The supplied depth was in feet it has been converted to metres",
                    )
                )
            else:
                assertions.append(QA.passed(C.DEPTH_IN_FEET))
        else:
            assertions.append(
                QA.failed(C.DEPTH_NON_NUMERIC, f"Can't parse verbatimDepth {raw['verbatimDepth']}")
            )
    if raw.get("verbatimElevation") is not None:
        parsed = distance_parser.parse(str(raw["verbatimElevation"]))
        if parsed is not None:
            elevation, unit = parsed
            processed["verbatimElevation"] = str(elevation)
            if elevation > 10000 or elevation < -100:
                assertions.append(
                    QA.failed(
                        C.ALTITUDE_OUT_OF_RANGE,
                        f"Elevation {elevation} is greater than 10,000 metres or less than -100 metres.",
                    )
                )
            else:
                assertions.append(QA.passed(C.ALTITUDE_OUT_OF_RANGE))
            assertions.append(QA.passed(C.ALTITUDE_NON_NUMERIC))
            if unit == "feet":
                assertions.append(
                    QA.failed(
                        C.ALTITUDE_IN_FEET,
                        "The supplied altitude was in feet it has been converted to metres",
                    )
                )
            else:
                assertions.append(QA.passed(C.ALTITUDE_IN_FEET))
        else:
            assertions.append(
                QA.failed(
                    C.ALTITUDE_NON_NUMERIC,
                    f"Can't parse verbatimElevation {raw['verbatimElevation']}",
                )
            )

    for min_key, max_key, code in (
        ("minimumDepthInMeters", "maximumDepthInMeters", C.MIN_MAX_DEPTH_REVERSED),
        ("minimumElevationInMeters", "maximumElevationInMeters", C.MIN_MAX_ALTITUDE_REVERSED),
    ):
        if raw.get(min_key) is not None and raw.get(max_key) is not None:
            lo, hi = _to_float(raw[min_key]), _to_float(raw[max_key])
            if lo is None or hi is None:
                continue
            kind = "depths" if "Depth" in min_key else "elevations"
            if lo > hi:
                processed[min_key], processed[max_key] = str(hi), str(lo)
                assertions.append(
                    QA.failed(
                        code,
                        f"The minimum, {lo} and maximum, {hi} {kind} have been transposed.",
                    )
                )
            else:
                processed[min_key], processed[max_key] = str(lo), str(hi)
                assertions.append(QA.passed(code))


def validate_georeference_values(raw: dict, processed: dict, assertions: list) -> None:
    """validateGeoreferenceValues (LocationProcessor.scala:755-787)."""
    checks = (
        ("geodeticDatum", C.MISSING_GEODETICDATUM, "Missing geodeticDatum"),
        ("georeferencedBy", C.MISSING_GEOREFERENCEDBY, "Missing georeferencedBy"),
        ("georeferenceProtocol", C.MISSING_GEOREFERENCEPROTOCOL, "Missing georeferenceProtocol"),
        ("georeferenceSources", C.MISSING_GEOREFERENCESOURCES, "Missing georeferenceSources"),
        (
            "georeferenceVerificationStatus",
            C.MISSING_GEOREFERENCEVERIFICATIONSTATUS,
            "Missing georeferenceVerificationStatus",
        ),
    )
    for key, code, comment in checks:
        if raw.get(key) is None and processed.get(key) is None:
            assertions.append(QA.failed(code, comment))
        else:
            assertions.append(QA.passed(code))
    if not str(raw.get("georeferencedDate") or "").strip():
        assertions.append(QA.failed(C.MISSING_GEOREFERENCE_DATE))
    else:
        assertions.append(QA.passed(C.MISSING_GEOREFERENCE_DATE))


def process_location(
    raw: dict,
    intersect=None,
    species_habitats: list[str] | None = None,
    default_country: str | None = None,
) -> tuple[dict, list]:
    """Full location stage for one record (LocationProcessor.process,
    LocationProcessor.scala:30-110). Returns (processed, assertions).

    `intersect`: optional callable (lat: float, lon: float) -> dict with
    keys stateProvince / country / lga / biome — the SpatialLayerDAO
    analog; in the Spark chain this is served by the sampling join
    (operators/sampling.py), here it enables the per-record path.
    `species_habitats`: taxon-profile habitats for the biome test."""
    assertions: list[QA] = []
    processed: dict = {}

    point = process_lat_long(raw, assertions)
    process_altitude_depth(raw, processed, assertions)
    if point is not None:
        processed["decimalLatitude"] = point["latitude"]
        processed["decimalLongitude"] = point["longitude"]
        processed["geodeticDatum"] = point["datum"]
        # grid references carry their own uncertainty (grid cell size)
        if point.get("uncertainty") and not raw.get("coordinateUncertaintyInMeters"):
            processed["coordinateUncertaintyInMeters"] = f"{float(point['uncertainty']):.1f}"
        validate_coordinates(raw, processed, assertions)
        check_coordinate_uncertainty(raw, processed, assertions)
        if intersect is not None and processed.get("decimalLatitude") is not None:
            values = intersect(
                _to_float(processed["decimalLatitude"]),
                _to_float(processed["decimalLongitude"]),
            ) or {}
            processed["stateProvince"] = values.get("stateProvince")
            processed["lga"] = values.get("lga")
            processed["country"] = values.get("country")
            # state layer outranks the country layer under a default country
            # (LocationProcessor.scala:66-69)
            if processed.get("stateProvince") is not None and default_country:
                processed["country"] = default_country
            processed["biome"] = values.get("biome")
        if raw.get("habitat") is not None:
            processed["habitat"] = raw["habitat"]
    else:
        no_location = all(
            not raw.get(k)
            for k in (
                "decimalLatitude",
                "decimalLongitude",
                "verbatimLatitude",
                "verbatimLongitude",
                "easting",
                "northing",
                "gridReference",
                "locality",
                "stateProvince",
                "country",
            )
        )
        if no_location:
            assertions.append(
                QA.failed(C.LOCATION_NOT_SUPPLIED, "No location information has been provided")
            )
    process_state_country_values(raw, processed)
    for key in (
        "georeferencedBy",
        "georeferenceProtocol",
        "georeferenceRemarks",
        "georeferenceSources",
        "georeferenceVerificationStatus",
    ):
        if raw.get(key) is not None:
            processed[key] = raw[key]
    validate_centre_points(raw, processed, assertions)
    validate_georeference_values(raw, processed, assertions)
    check_state_mismatch(raw, processed, assertions)
    check_biome_mismatch(processed, species_habitats, assertions)
    return processed, assertions
