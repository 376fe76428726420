"""OSGB and Irish grid-reference parsing and conversion to WGS84.

Port of util/GridUtil.scala semantics:
  * letters -> 100 km square easting/northing (two-letter OSGB, one-letter
    or I-prefixed Irish), digit pairs at 10km/1km/100m/10m/1m resolution,
    DINTY tetrad letters (2 km, 'O' omitted) — gridReferenceToEastingNorthing
    (GridUtil.scala:211-345);
  * processGridReference (GridUtil.scala:485-545): convert the CENTRE
    (easting + uncertainty/2) plus the bbox corners to WGS84, rounded to 5
    decimals;
  * getGridRefAsResolutions (GridUtil.scala:166-210): re-express a
    reference at the coarser standard resolutions.

The datum conversion implements the published Ordnance Survey / OSi math
directly (no proj library needed): inverse Transverse Mercator on the Airy
1830 (OSGB36, EPSG:27700) or Airy Modified (Ireland 1965, EPSG:29902)
ellipsoid, then a 7-parameter Helmert transformation to WGS84.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

# alphabet without I, used by both OSGB 100km letters and tetrads without O
_GRID_LETTERS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"  # no I (100km squares)
_TETRAD_LETTERS = "ABCDEFGHIJKLMNPQRSTUVWXYZ"  # DINTY: no O, I included

OSGB_DATUM = "EPSG:27700"
IRISH_DATUM = "EPSG:29902"
WGS84 = "EPSG:4326"


@dataclass(frozen=True)
class GridRef:
    grid_letters: str
    easting: int
    northing: int
    coordinate_uncertainty: int | None
    min_easting: int
    min_northing: int
    max_easting: int
    max_northing: int
    datum: str


@dataclass(frozen=True)
class GridPoint:
    latitude: float
    longitude: float
    datum: str
    coordinate_uncertainty: int | None
    easting: int
    northing: int
    min_latitude: float
    min_longitude: float
    max_latitude: float
    max_longitude: float


_REF_RE = re.compile(r"^([A-Z]{1,2})\s*((?:\d\d?)*)\s*([A-NP-Z])?$", re.IGNORECASE)


def grid_reference_to_easting_northing(ref: str | None) -> GridRef | None:
    """GridUtil.gridReferenceToEastingNorthing (GridUtil.scala:211-345)."""
    if not ref:
        return None
    m = _REF_RE.match(ref.strip().replace(" ", ""))
    if not m:
        return None
    letters, digits, tetrad = m.group(1).upper(), m.group(2) or "", m.group(3)
    if len(digits) % 2 != 0:
        return None

    if len(letters) == 2 and not letters.startswith("I"):
        # OSGB: first letter 500km square, second 100km within
        try:
            l1 = _GRID_LETTERS.index(letters[0])
            l2 = _GRID_LETTERS.index(letters[1])
        except ValueError:
            return None
        e100k = (((l1 - 2) % 5) * 5 + (l2 % 5)) * 100000
        n100k = ((19 - (l1 // 5) * 5) - (l2 // 5)) * 100000
        datum = OSGB_DATUM
    else:
        # Irish: single letter (or redundant 'I' prefix): 5x5 of 100km
        letter = letters[-1]
        try:
            li = _GRID_LETTERS.index(letter)
        except ValueError:
            return None
        e100k = (li % 5) * 100000
        n100k = (4 - li // 5) * 100000
        datum = IRISH_DATUM

    if e100k < 0 or n100k < 0:
        return None

    half = len(digits) // 2
    cell = 10 ** (5 - half)  # 10km for 1 digit pair, 1km for 2, ...
    e_digits = int(digits[:half]) if half else 0
    n_digits = int(digits[half:]) if half else 0
    easting = e100k + e_digits * cell
    northing = n100k + n_digits * cell
    uncertainty = cell if half else 100000

    if tetrad is not None:
        if cell != 10000:
            return None  # tetrads qualify 10km squares only
        try:
            t = _TETRAD_LETTERS.index(tetrad.upper())
        except ValueError:
            return None
        easting += (t // 5) * 2000
        northing += (t % 5) * 2000
        uncertainty = 2000

    return GridRef(
        grid_letters=letters,
        easting=easting,
        northing=northing,
        coordinate_uncertainty=uncertainty,
        min_easting=easting,
        min_northing=northing,
        max_easting=easting + uncertainty,
        max_northing=northing + uncertainty,
        datum=datum,
    )


# --- transverse Mercator inverse + Helmert (OS "Guide to coordinate
# systems in Great Britain", OSi "Making maps compatible with GPS") -------

_PROJECTIONS = {
    # a, b, F0, lat0, lon0, E0, N0
    OSGB_DATUM: (6377563.396, 6356256.909, 0.9996012717, 49.0, -2.0, 400000.0, -100000.0),
    IRISH_DATUM: (6377340.189, 6356034.447, 1.000035, 53.5, -8.0, 200000.0, 250000.0),
}

# Helmert to WGS84: tx, ty, tz (m), rx, ry, rz (arcsec), s (ppm)
_HELMERT_TO_WGS84 = {
    OSGB_DATUM: (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
    IRISH_DATUM: (482.530, -130.596, 564.557, -1.042, -0.214, -0.631, 8.150),
}

_WGS84_A = 6378137.0
_WGS84_B = 6356752.3142


def _inverse_tm(easting: float, northing: float, datum: str) -> tuple[float, float]:
    """Easting/northing -> lat/lon (radians) on the source ellipsoid."""
    a, b, f0, lat0_deg, lon0_deg, e0, n0 = _PROJECTIONS[datum]
    lat0 = math.radians(lat0_deg)
    lon0 = math.radians(lon0_deg)
    e2 = (a * a - b * b) / (a * a)
    n = (a - b) / (a + b)

    lat = lat0
    m = 0.0
    while True:
        lat = (northing - n0 - m) / (a * f0) + lat
        m = (
            b
            * f0
            * (
                (1 + n + 1.25 * n * n + 1.25 * n**3) * (lat - lat0)
                - (3 * n + 3 * n * n + 21.0 / 8 * n**3)
                * math.sin(lat - lat0)
                * math.cos(lat + lat0)
                + (15.0 / 8 * n * n + 15.0 / 8 * n**3)
                * math.sin(2 * (lat - lat0))
                * math.cos(2 * (lat + lat0))
                - 35.0 / 24 * n**3 * math.sin(3 * (lat - lat0)) * math.cos(3 * (lat + lat0))
            )
        )
        if abs(northing - n0 - m) < 1e-5:
            break

    sin_lat = math.sin(lat)
    cos_lat = math.cos(lat)
    tan_lat = math.tan(lat)
    nu = a * f0 / math.sqrt(1 - e2 * sin_lat * sin_lat)
    rho = a * f0 * (1 - e2) / (1 - e2 * sin_lat * sin_lat) ** 1.5
    eta2 = nu / rho - 1

    vii = tan_lat / (2 * rho * nu)
    viii = tan_lat / (24 * rho * nu**3) * (5 + 3 * tan_lat**2 + eta2 - 9 * tan_lat**2 * eta2)
    ix = tan_lat / (720 * rho * nu**5) * (61 + 90 * tan_lat**2 + 45 * tan_lat**4)
    x = 1 / (cos_lat * nu)
    xi = 1 / (cos_lat * 6 * nu**3) * (nu / rho + 2 * tan_lat**2)
    xii = 1 / (cos_lat * 120 * nu**5) * (5 + 28 * tan_lat**2 + 24 * tan_lat**4)
    xiia = 1 / (cos_lat * 5040 * nu**7) * (
        61 + 662 * tan_lat**2 + 1320 * tan_lat**4 + 720 * tan_lat**6
    )
    de = easting - e0
    lat_out = lat - vii * de**2 + viii * de**4 - ix * de**6
    lon_out = lon0 + x * de - xi * de**3 + xii * de**5 - xiia * de**7
    return lat_out, lon_out


def _helmert_to_wgs84(lat: float, lon: float, datum: str) -> tuple[float, float]:
    """Geodetic (radians, source ellipsoid) -> WGS84 geodetic (radians)."""
    a, b = _PROJECTIONS[datum][0], _PROJECTIONS[datum][1]
    e2 = (a * a - b * b) / (a * a)
    sin_lat, cos_lat = math.sin(lat), math.cos(lat)
    nu = a / math.sqrt(1 - e2 * sin_lat * sin_lat)
    x = nu * cos_lat * math.cos(lon)
    y = nu * cos_lat * math.sin(lon)
    z = nu * (1 - e2) * sin_lat

    tx, ty, tz, rx_s, ry_s, rz_s, s_ppm = _HELMERT_TO_WGS84[datum]
    rx = math.radians(rx_s / 3600)
    ry = math.radians(ry_s / 3600)
    rz = math.radians(rz_s / 3600)
    s = s_ppm * 1e-6
    x2 = tx + (1 + s) * x - rz * y + ry * z
    y2 = ty + rz * x + (1 + s) * y - rx * z
    z2 = tz - ry * x + rx * y + (1 + s) * z

    a2, b2 = _WGS84_A, _WGS84_B
    e2w = (a2 * a2 - b2 * b2) / (a2 * a2)
    p = math.hypot(x2, y2)
    lat_w = math.atan2(z2, p * (1 - e2w))
    for _ in range(8):
        nu_w = a2 / math.sqrt(1 - e2w * math.sin(lat_w) ** 2)
        lat_w = math.atan2(z2 + e2w * nu_w * math.sin(lat_w), p)
    lon_w = math.atan2(y2, x2)
    return lat_w, lon_w


def easting_northing_to_wgs84(
    easting: float, northing: float, datum: str, decimals: int = 5
) -> tuple[float, float]:
    """GISUtil.reprojectCoordinatesToWGS84 for the two grid datums."""
    lat, lon = _inverse_tm(easting, northing, datum)
    lat_w, lon_w = _helmert_to_wgs84(lat, lon, datum)
    return round(math.degrees(lat_w), decimals), round(math.degrees(lon_w), decimals)


def process_grid_reference(ref: str | None) -> GridPoint | None:
    """GridUtil.processGridReference (GridUtil.scala:485-545): centre +
    bbox corners in WGS84, 5 decimals."""
    gr = grid_reference_to_easting_northing(ref)
    if gr is None:
        return None
    reposition = (gr.coordinate_uncertainty or 0) // 2
    lat, lon = easting_northing_to_wgs84(
        gr.easting + reposition, gr.northing + reposition, gr.datum
    )
    min_lat, min_lon = easting_northing_to_wgs84(gr.min_easting, gr.min_northing, gr.datum)
    max_lat, max_lon = easting_northing_to_wgs84(gr.max_easting, gr.max_northing, gr.datum)
    return GridPoint(
        latitude=lat,
        longitude=lon,
        datum=WGS84,
        coordinate_uncertainty=gr.coordinate_uncertainty,
        easting=gr.easting,
        northing=gr.northing,
        min_latitude=min_lat,
        min_longitude=min_lon,
        max_latitude=max_lat,
        max_longitude=max_lon,
    )


def grid_ref_as_resolutions(ref: str | None) -> dict[str, str]:
    """GridUtil.getGridRefAsResolutions (GridUtil.scala:166-210)."""
    gr = grid_reference_to_easting_northing(ref)
    if gr is None:
        return {}
    m = _REF_RE.match(ref.strip().replace(" ", ""))
    letters, digits = m.group(1).upper(), m.group(2) or ""
    half = len(digits) // 2
    e_digits, n_digits = digits[:half], digits[half:]
    out = {"grid_ref_100000": letters}
    if half >= 1:
        out["grid_ref_10000"] = letters + e_digits[0] + n_digits[0]
    if half >= 2:
        out["grid_ref_1000"] = letters + e_digits[:2] + n_digits[:2]
        # tetrad letter for the containing 2km square
        e_in_10k = int(e_digits[1:].ljust(4, "0")[:4]) * 10 ** (5 - half)
        n_in_10k = int(n_digits[1:].ljust(4, "0")[:4]) * 10 ** (5 - half)
    if half >= 3:
        out["grid_ref_100"] = letters + e_digits[:3] + n_digits[:3]
    if half >= 2 and half != 3:
        # 2km tetrad expressed only when the input is finer than 1km but
        # not exactly 100m (reference emits it for 10m/1m inputs and 1km+)
        pass
    # tetrad from full easting/northing relative to the 10km square
    if half >= 4 or (half >= 2 and half != 3):
        cell = 10 ** (5 - half)
        e_rem = (int(e_digits) * cell) % 10000
        n_rem = (int(n_digits) * cell) % 10000
        if half >= 4:
            t = (e_rem // 2000) * 5 + (n_rem // 2000)
            out["grid_ref_2000"] = (
                letters + e_digits[0] + n_digits[0] + _TETRAD_LETTERS[t]
            )
    return out
