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


# case ladder mirrors GridUtil.scala:346-356 (OSGB) / :236-245 (Irish):
# 1-number, easting+northing, 2km tetrad suffix, quadrant suffix, letters-only
_OS_1NUM = re.compile(r"([A-Z]{2})\s*([0-9]+)")
_OS_EN = re.compile(r"([A-Z]{2})\s*([0-9]+)\s*([0-9]+)")
_OS_2K = re.compile(r"([A-Z]{2})\s*([0-9]+)\s*([0-9]+)\s*([A-Z])")
_OS_QUAD = re.compile(r"([A-Z]{2})\s*([0-9]+)\s*([0-9]+)\s*(NW|NE|SW|SE)")
_OS_LETTERS = re.compile(r"([A-Z]{2})")
_IR_1NUM = re.compile(r"(I?[A-Z])\s*([0-9]+)")
_IR_EN = re.compile(r"(I?[A-Z])\s*([0-9]+)\s*([0-9]+)")
_IR_2K = re.compile(r"(I?[A-Z])\s*([0-9]+)\s*([0-9]+)\s*([A-Z])")
_IR_QUAD = re.compile(r"(I?[A-Z])\s*([0-9]+)\s*([0-9]+)\s*(NW|NE|SW|SE)")
# letters-only Irish refs accept only the reference's 20-letter alphabet
# (GridUtil.scala:38-40)
_IR_LETTERS = re.compile(r"(I?[ABCDFGHJLMNOQRSTVWXY])")

# accuracy per digit count, halved for quadrants, /5 for tetrads
# (GridUtil.getCoordinateUncertaintyFromGridRef, GridUtil.scala:75-90)
_ACCURACY = {10: 1, 8: 10, 6: 100, 4: 1000, 2: 10000, 0: 100000}
# tetrad / quadrant cell size per easting-digit count (GridUtil.scala:424/446)
_TETRAD_CELL = {1: 2000, 2: 200, 3: 20, 4: 2}
_QUAD_CELL = {1: 5000, 2: 500, 3: 50, 4: 5}


def _uncertainty(n_digits: int, n_alpha: int) -> int | None:
    acc = _ACCURACY.get(n_digits)
    if acc is None:
        return None
    if n_alpha == 2:
        return acc // 2
    if n_alpha == 1:
        return acc // 5
    return acc


def _parse_cases(s: str, pats) -> tuple[str, str, str, str, str, int | None] | None:
    """Run the reference's ordered regex case ladder; returns
    (letters, easting, northing, tetrad, quad, uncertainty)."""
    p_1num, p_en, p_2k, p_quad, p_letters = pats
    if m := p_1num.fullmatch(s):
        digits = m.group(2)
        half = len(digits) // 2
        return m.group(1), digits[:half], digits[half:], "", "", _uncertainty(len(digits), 0)
    if m := p_en.fullmatch(s):
        return m.group(1), m.group(2), m.group(3), "", "", _uncertainty(len(m.group(2)) * 2, 0)
    if m := p_2k.fullmatch(s):
        return m.group(1), m.group(2), m.group(3), m.group(4), "", _uncertainty(len(m.group(2)) * 2, 1)
    if m := p_quad.fullmatch(s):
        return m.group(1), m.group(2), m.group(3), "", m.group(4), _uncertainty(len(m.group(2)) * 2, 2)
    if m := p_letters.fullmatch(s):
        return m.group(1), "0", "0", "", "", _uncertainty(0, 0)
    return None


def _apply_subcell(
    e: int, n: int, easting_str: str, tetrad: str, quad: str
) -> tuple[int | None, int]:
    """Tetrad (DINTY) and quadrant repositioning (GridUtil.scala:420-476).

    NOTE on quadrants: the reference's quadRef branch pattern-matches on the
    `twoKRef` variable — empty in that branch — so as *written* it rejects
    every quadrant ref its own regex just accepted (GridUtil.scala:446-476,
    both the OSGB and Irish copies). We implement the evident intent of the
    branch body: reposition to the quadrant centre."""
    if tetrad:
        cell = _TETRAD_CELL.get(len(easting_str), 0)
        code = ord(tetrad)
        if code <= ord("N"):
            idx = code - 65
        elif code >= ord("P"):
            idx = code - 66
        else:  # 'O' is not a DINTY letter
            return None, 0
        e += (idx // 5) * cell
        n += (idx % 5) * cell
    elif quad:
        cell = _QUAD_CELL.get(len(easting_str), 0)
        if cell > 0:
            if quad == "NW":
                e, n = e + cell // 2, n + cell + cell // 2
            elif quad == "NE":
                e, n = e + cell + cell // 2, n + cell + cell // 2
            elif quad == "SW":
                e, n = e + cell // 2, n + cell // 2
            elif quad == "SE":
                e, n = e + cell + cell // 2, n + cell // 2
    return e, n


def _jmod(a: int, b: int) -> int:
    """Java/Scala % (sign of the dividend), used by the 500km-letter math."""
    return a - int(a / b) * b


def os_grid_reference_to_easting_northing(ref: str) -> GridRef | None:
    """GridUtil.osGridReferenceToEastingNorthing (GridUtil.scala:346-480)."""
    parsed = _parse_cases(
        ref.strip().upper(), (_OS_1NUM, _OS_EN, _OS_2K, _OS_QUAD, _OS_LETTERS)
    )
    if parsed is None:
        return None
    letters, easting, northing, tetrad, quad, unc = parsed
    # 25-letter (no I) index == the reference's skip-I adjustment
    # (GridUtil.scala:379-395); 'I' itself is rejected rather than aliased
    try:
        l1 = _GRID_LETTERS.index(letters[0])
        l2 = _GRID_LETTERS.index(letters[1])
    except ValueError:
        return None
    e100k = _jmod(l1 - 2, 5) * 5 + _jmod(l2, 5)
    n100k = (19 - (l1 // 5) * 5) - (l2 // 5)
    if not (0 <= e100k <= 6 and 0 <= n100k <= 12):
        return None
    if len(easting) != len(northing):
        return None
    e = e100k * 100000 + int((easting + "00000")[:5])
    n = n100k * 100000 + int((northing + "00000")[:5])
    e, n = _apply_subcell(e, n, easting, tetrad, quad)
    if e is None:
        return None
    return GridRef(
        grid_letters=letters,
        easting=e,
        northing=n,
        coordinate_uncertainty=unc,
        min_easting=e,
        min_northing=n,
        max_easting=e + (unc or 0),
        max_northing=n + (unc or 0),
        datum=OSGB_DATUM,
    )


def irish_grid_reference_to_easting_northing(ref: str) -> GridRef | None:
    """GridUtil.irishGridReferenceToEastingNorthing (GridUtil.scala:236-335).

    The reference indexes a 20-letter/4-column array that agrees with the
    standard 25-letter (no I) 5x5 Irish grid on every letter it contains;
    we use the full 5x5 mapping, so the eastern-column letters the
    reference array omits (E, K, P, U, Z) resolve to their true squares
    instead of arithmetic garbage. Unlike OSGB, the reference performs no
    easting/northing length validation on the Irish path — odd-digit refs
    are accepted with a null uncertainty — and that laxness is kept."""
    parsed = _parse_cases(
        ref.strip().upper(), (_IR_1NUM, _IR_EN, _IR_2K, _IR_QUAD, _IR_LETTERS)
    )
    if parsed is None:
        return None
    letters, easting, northing, tetrad, quad, unc = parsed
    letter = letters[-1]  # optional redundant 'I' prefix
    try:
        li = _GRID_LETTERS.index(letter)
    except ValueError:
        return None
    e = (li % 5) * 100000 + int((easting + "00000")[:5])
    n = (4 - li // 5) * 100000 + int((northing + "00000")[:5])
    e, n = _apply_subcell(e, n, easting, tetrad, quad)
    if e is None:
        return None
    return GridRef(
        grid_letters=letters,
        easting=e,
        northing=n,
        coordinate_uncertainty=unc,
        min_easting=e,
        min_northing=n,
        max_easting=e + (unc or 0),
        max_northing=n + (unc or 0),
        datum=IRISH_DATUM,
    )


def grid_reference_to_easting_northing(ref: str | None) -> GridRef | None:
    """GridUtil.gridReferenceToEastingNorthing (GridUtil.scala:211-222):
    OSGB first, falling back to the Irish grid."""
    if not ref:
        return None
    result = os_grid_reference_to_easting_northing(ref)
    if result is not None:
        return result
    return irish_grid_reference_to_easting_northing(ref)


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


def _inverse_tm(easting: float, northing: float, datum) -> tuple[float, float]:
    """Easting/northing -> lat/lon (radians) on the source ellipsoid.
    `datum` is a _PROJECTIONS key or a literal parameter tuple (the UTM
    module passes tuples so it never mutates this module's table)."""
    params = _PROJECTIONS[datum] if isinstance(datum, str) else datum
    a, b, f0, lat0_deg, lon0_deg, e0, n0 = params
    lat0 = math.radians(lat0_deg)
    lon0 = math.radians(lon0_deg)
    e2 = (a * a - b * b) / (a * a)
    n = (a - b) / (a + b)

    if not (math.isfinite(easting) and math.isfinite(northing)):
        raise ValueError("non-finite easting/northing")

    lat = lat0
    m = 0.0
    # iteration cap: the meridional-arc iteration converges in a handful of
    # steps for any on-ellipsoid northing; NaN or astronomically large
    # values would otherwise never satisfy the tolerance and hang the
    # executor task forever (one dirty record = one stuck job)
    for _ in range(100):
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
    else:
        raise ValueError(f"meridional arc did not converge for northing {northing!r}")

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


# Geographic legacy datums: EPSG -> (ellipsoid a, b, Helmert-to-WGS84 params
# in position-vector convention, or None when the datum is GRS80-based and
# coincident with WGS84 at this engine's precision). Parameters are the
# published ICSM (AGD66 "A66 National", AGD84) and OS/EPSG values —
# GISUtil.reprojectCoordinatesToWGS84 (util/GISUtil.scala:27-60) does the
# same transform through geotools.
_GRS80_B = 6356752.314140
_GEOGRAPHIC_DATUMS: dict[str, tuple[float, float, tuple | None]] = {
    # AGD66 / AGD84 on the Australian National Spheroid (1/f = 298.25)
    "EPSG:4202": (6378160.0, 6356774.719, (-117.808, -51.536, 137.784, -0.303, -0.446, -0.234, -0.290)),
    "EPSG:4203": (6378160.0, 6356774.719, (-117.763, -51.510, 139.061, -0.292, -0.443, -0.277, -0.191)),
    # OSGB36 geographic (Airy 1830)
    "EPSG:4277": (6377563.396, 6356256.909, (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)),
    # ED50 (International 1924), NAD27 (Clarke 1866), Tokyo (Bessel 1841):
    # standard 3-parameter shifts
    "EPSG:4230": (6378388.0, 6356911.946, (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)),
    "EPSG:4267": (6378206.4, 6356583.8, (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)),
    "EPSG:4301": (6377397.155, 6356078.963, (-146.414, 507.337, 680.507, 0.0, 0.0, 0.0, 0.0)),
    # NZGD49 (International 1924), standard 3-parameter shift
    "EPSG:4272": (6378388.0, 6356911.946, (54.4, -20.1, 183.1, 0.0, 0.0, 0.0, 0.0)),
    # GRS80-based: GDA94, GDA2020, NAD83, ETRS89 — null transform
    "EPSG:4283": (6378137.0, _GRS80_B, None),
    "EPSG:7844": (6378137.0, _GRS80_B, None),
    "EPSG:4269": (6378137.0, _GRS80_B, None),
    "EPSG:4258": (6378137.0, _GRS80_B, None),
}


def _helmert_core(
    lat: float, lon: float, a: float, b: float, params: tuple
) -> tuple[float, float]:
    """Geodetic (radians, source ellipsoid a/b) -> WGS84 geodetic (radians)
    via cartesian 7-parameter Helmert (position-vector convention)."""
    e2 = (a * a - b * b) / (a * a)
    sin_lat, cos_lat = math.sin(lat), math.cos(lat)
    nu = a / math.sqrt(1 - e2 * sin_lat * sin_lat)
    x = nu * cos_lat * math.cos(lon)
    y = nu * cos_lat * math.sin(lon)
    z = nu * (1 - e2) * sin_lat

    tx, ty, tz, rx_s, ry_s, rz_s, s_ppm = params
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


def reproject_geographic_to_wgs84(
    lat_deg: float, lon_deg: float, epsg: str, decimals: int
) -> tuple[float, float] | None:
    """GISUtil.reprojectCoordinatesToWGS84 (util/GISUtil.scala:27-60) for
    geographic (lat/lon) source CRSs: Helmert datum shift to WGS84, rounded
    to the requested decimals. Returns None for unknown EPSG codes."""
    entry = _GEOGRAPHIC_DATUMS.get(epsg.upper())
    if entry is None:
        return None
    a, b, params = entry
    if params is None:
        return round(lat_deg, decimals), round(lon_deg, decimals)
    lat_w, lon_w = _helmert_core(
        math.radians(lat_deg), math.radians(lon_deg), a, b, params
    )
    return round(math.degrees(lat_w), decimals), round(math.degrees(lon_w), decimals)


def _helmert_to_wgs84(lat: float, lon: float, datum: str) -> tuple[float, float]:
    """Geodetic (radians, grid-datum ellipsoid) -> WGS84 geodetic (radians)."""
    a, b = _PROJECTIONS[datum][0], _PROJECTIONS[datum][1]
    return _helmert_core(lat, lon, a, b, _HELMERT_TO_WGS84[datum])


def easting_northing_to_wgs84(
    easting: float, northing: float, datum: str, decimals: int = 5
) -> tuple[float, float]:
    """GISUtil.reprojectCoordinatesToWGS84 for the two grid datums."""
    lat, lon = _inverse_tm(easting, northing, datum)
    lat_w, lon_w = _helmert_to_wgs84(lat, lon, datum)
    return round(math.degrees(lat_w), decimals), round(math.degrees(lon_w), decimals)


def process_grid_reference(ref: str | None) -> GridPoint | None:
    """GridUtil.processGridReference (GridUtil.scala:485-545): centre +
    bbox corners in WGS84, 5 decimals.

    REFERENCE PARITY QUIRKS preserved verbatim: (1) quadrant refs (NW/
    NE/SW/SE) are pre-centred by the parse (GridUtil.scala:308-327) and
    then the unconditional +uncertainty/2 here recentres them AGAIN —
    the reference reports the quadrant's NE corner with a half-cell-
    shifted bbox, and so do we; (2) Irish refs keeping the optional 'I'
    prefix carry it into grid_ref_* resolution keys (the reference's
    gridLetters capture includes it), so 'J44' and 'IJ44' name the same
    square under different keys."""
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
    """GridUtil.getGridRefAsResolutions (GridUtil.scala:166-207): re-express
    the reference at the coarser standard resolutions, gated on the parsed
    uncertainty — grid_ref_2000 whenever uncertainty <= 2000 m (so tetrad,
    1km, 100m, 10m and 1m inputs all carry it), 1000 at <= 1000, 100 at
    <= 100; the parsed easting/northing (tetrad/quadrant offsets included)
    drive the digits, not the raw input string."""
    if not ref:
        return {}
    gr = grid_reference_to_easting_northing(ref)
    if gr is None:
        return {}
    grid_size = (
        gr.coordinate_uncertainty if gr.coordinate_uncertainty is not None else -1
    )
    out = {"grid_ref_100000": gr.grid_letters}
    if len(ref.strip()) > 2:
        e_str = str(gr.easting % 100000).zfill(5)
        n_str = str(gr.northing % 100000).zfill(5)
        out["grid_ref_10000"] = gr.grid_letters + e_str[0] + n_str[0]
        tetrad = _TETRAD_LETTERS[(int(e_str[1]) // 2) * 5 + (int(n_str[1]) // 2)]
        if 0 <= grid_size <= 2000:
            out["grid_ref_2000"] = gr.grid_letters + e_str[0] + n_str[0] + tetrad
        if 0 <= grid_size <= 1000:
            out["grid_ref_1000"] = gr.grid_letters + e_str[:2] + n_str[:2]
        if 0 <= grid_size <= 100:
            out["grid_ref_100"] = gr.grid_letters + e_str[:3] + n_str[:3]
    return out
