"""Rounding-boundary margins for the generated geodesy oracles.

datum_reprojection / utm_inverse compare Python (libm) doubles against
DuckDB-evaluated SQL replaying the same formulas. Equality after rounding
is only guaranteed while no value in the (finite, key-modulus-bounded)
input space sits near a rounding boundary; worst-case cross-engine drift is
~1e-10 degrees (the adaptive-stop vs fixed-unroll difference of the
meridional-arc iteration, parsers/gridref._inverse_tm), i.e. ~1e-5 quantum
fractions at 5dp. These tests pin the margin two orders above that so input
tweaks that erode safety fail loudly here rather than flaking the driver
gate.
"""

from __future__ import annotations

from biocache_store_spark.parsers.gridref import reproject_geographic_to_wgs84
from biocache_store_spark.parsers.utm import easting_northing_zone_to_wgs84
from biocache_store_spark.queries._geo_sql import DATUM_QUERY_DATUMS

MIN_MARGIN = 1e-4  # quantum fractions; observed minima: 1.8e-4 / 3.5e-4


def _margin(v: float, dp: int) -> float:
    return abs((v * 10**dp) % 1 - 0.5)


def test_datum_reprojection_margins():
    worst = 1.0
    for k in range(200):  # the query's full k%200 input space
        lat = (k % 50) * 1.37 - 40.123
        lon = (k % 40) * 3.1 + 100.456
        out = reproject_geographic_to_wgs84(lat, lon, DATUM_QUERY_DATUMS[k % 4], 12)
        if out is not None:
            worst = min(worst, _margin(out[0], 6), _margin(out[1], 6))
    assert worst > MIN_MARGIN, worst


def test_utm_inverse_margins():
    srss = [None, "AGD66", "AGD84", "WGS84", "GDA94"]
    zones = ["50", "51", "52", "55N", "99"]
    worst = 1.0
    for k in range(120):  # the query's full k%120 input space
        out = easting_northing_zone_to_wgs84(
            300000.0 + (k % 60) * 6000,
            6000000.0 + (k % 40) * 50000,
            zones[k % 5],
            srss[k % 5],
            decimals=12,
        )
        if out is not None:
            worst = min(worst, _margin(out[0], 5), _margin(out[1], 5))
    assert worst > MIN_MARGIN, worst


def test_utm_known_zone_center():
    """Sanity pin independent of the oracle: the central meridian of UTM
    zone 55S at the false-northing origin is (0 lat, 147 lon)."""
    out = easting_northing_zone_to_wgs84(500000.0, 10000000.0, "55S", "WGS84")
    assert out == (0.0, 147.0)


def test_utm_invalid_zone_none():
    assert easting_northing_zone_to_wgs84(500000.0, 6000000.0, "99", "GDA94") is None
