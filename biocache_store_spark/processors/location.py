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
fully converted; bare easting/northing+zone triples remain stubbed pending
a UTM zone registry.
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
    try:
        if s is None or str(s).strip() == "":
            return None
        return float(str(s).strip())
    except ValueError:
        return None


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
            return {"latitude": str(dlat), "longitude": str(dlon), "datum": WGS84_EPSG}
        assertions.append(
            QA.failed(
                C.DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED,
                "Failed to calculate decimal latitude/longitude from verbatim",
            )
        )
        return None
    if raw.get("easting") is not None and raw.get("northing") is not None and raw.get("zone") is not None:
        # stub: UTM conversion needs a proj library (see module docstring)
        assertions.append(
            QA.failed(
                C.DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED,
                "Easting/northing conversion not available",
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


def process_location(raw: dict) -> tuple[dict, list]:
    """Full location stage for one record. Returns (processed, assertions)."""
    assertions: list[QA] = []
    processed: dict = {}

    point = process_lat_long(raw, assertions)
    if point is not None:
        processed["decimalLatitude"] = point["latitude"]
        processed["decimalLongitude"] = point["longitude"]
        processed["geodeticDatum"] = point["datum"]
        # grid references carry their own uncertainty (grid cell size)
        if point.get("uncertainty") and not raw.get("coordinateUncertaintyInMeters"):
            processed["coordinateUncertaintyInMeters"] = f"{float(point['uncertainty']):.1f}"
        validate_coordinates(raw, processed, assertions)
        check_coordinate_uncertainty(raw, processed, assertions)
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
    return processed, assertions
