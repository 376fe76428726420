"""Easting/northing + zone -> WGS84 (UTM / MGA / AMG grids).

Port of GridUtil.processNorthingEastingZone (util/GridUtil.scala:573-620):
the reference keys `verbatimSRS|zone` into resources/zoneEpsgCodes.txt
(AGD66 -> AMG zones 48-58, AGD84 -> AMG84 48-58, GDA94 -> MGA 48-57,
WGS84 -> UTM 1N-60N / 1S-60S) and reprojects through geotools, rounding to
5 decimals (~1 m). A missing verbatimSRS defaults to "GDA94|zone"
(GridUtil.scala:577-584).

Spark-first shape: the transform itself is pure math (transverse-Mercator
inverse + 7-parameter Helmert, both already implemented for the OSGB/Irish
grids in parsers/gridref.py) — no geo library, usable from the Arrow-batched
processor chain.
"""

from __future__ import annotations

import re

from biocache_store_spark.parsers.gridref import (
    _GEOGRAPHIC_DATUMS,
    _helmert_core,
    _inverse_tm,
)
import math

# Ellipsoids: AGD66/84 use the Australian National Spheroid, GDA94 GRS80,
# WGS84 itself (a, b); Helmert params pulled from the geographic-datum table
# (None = coincident with WGS84 at this precision).
_DATUMS: dict[str, tuple[float, float, str | None]] = {
    "AGD66": (6378160.0, 6356774.719, "EPSG:4202"),
    "AGD84": (6378160.0, 6356774.719, "EPSG:4203"),
    "GDA94": (6378137.0, 6356752.314140, None),
    "WGS84": (6378137.0, 6356752.3142, None),
}

# zoneEpsgCodes.txt zone ranges per datum: the southern-grid datums accept
# bare zone numbers 48-58 (GDA94 stops at 57); WGS84 requires N/S suffixed
# zones 1-60.
_SOUTH_ZONES = {"AGD66": range(48, 59), "AGD84": range(48, 59), "GDA94": range(48, 58)}

_ZONE_RE = re.compile(r"^(\d{1,2})([NS])?$")


def zone_epsg_code(verbatim_srs: str | None, zone: str) -> str | None:
    """The reference's epsgCodeKey lookup (GridUtil.scala:577-586) — returns
    the projected-CRS EPSG code, or None for unrecognized datum/zone."""
    datum = (verbatim_srs or "GDA94").upper().strip()
    m = _ZONE_RE.fullmatch(zone.strip().upper()) if zone else None
    if m is None:
        return None
    zone_num, hemi = int(m.group(1)), m.group(2)
    if datum in _SOUTH_ZONES:
        if hemi is not None or zone_num not in _SOUTH_ZONES[datum]:
            return None
        base = {"AGD66": 20200, "AGD84": 20300, "GDA94": 28300}[datum]
        return f"EPSG:{base + zone_num}"
    if datum == "WGS84":
        if hemi is None or not 1 <= zone_num <= 60:
            return None
        return f"EPSG:{(32600 if hemi == 'N' else 32700) + zone_num}"
    return None


def _utm_projection_params(datum: str, zone_num: int, southern: bool) -> tuple:
    """UTM zone as a gridref-style projection parameter tuple:
    (a, b, k0=0.9996, lat0=0, lon0=zone*6-183, E0=500000,
    N0=10_000_000 south / 0 north). Returned as a LOCAL tuple handed to
    _inverse_tm directly — never written into gridref's module table
    (cross-module mutation of private state, racy under threads)."""
    a, b, _ = _DATUMS[datum]
    return (
        a,
        b,
        0.9996,
        0.0,
        float(zone_num * 6 - 183),
        500000.0,
        10000000.0 if southern else 0.0,
    )


def easting_northing_zone_to_wgs84(
    easting: float,
    northing: float,
    zone: str,
    verbatim_srs: str | None = None,
    decimals: int = 5,
) -> tuple[float, float] | None:
    """GridUtil.processNorthingEastingZone: easting/northing/zone ->
    (lat, lon) in WGS84 rounded to 5 decimals; None when the datum|zone key
    is unrecognized (DECIMAL_LAT_LONG_CALCULATION_FROM_EASTING_NORTHING_FAILED)."""
    datum = (verbatim_srs or "GDA94").upper().strip()
    if zone_epsg_code(verbatim_srs, zone) is None:
        return None
    m = _ZONE_RE.fullmatch(zone.strip().upper())
    zone_num, hemi = int(m.group(1)), m.group(2)
    southern = hemi != "N"  # AMG/MGA zones are all southern-hemisphere grids
    params = _utm_projection_params(datum, zone_num, southern)
    try:
        lat, lon = _inverse_tm(easting, northing, params)
    except ValueError:
        # NaN / absurd northing: calculation failed, same outcome as an
        # unrecognised datum|zone key
        return None
    geographic_epsg = _DATUMS[datum][2]
    if geographic_epsg is not None:
        a, b, params = _GEOGRAPHIC_DATUMS[geographic_epsg]
        lat, lon = _helmert_core(lat, lon, a, b, params)
    return round(math.degrees(lat), decimals), round(math.degrees(lon), decimals)
