"""Grid-reference tests — mirrors the reference GridReferenceTest.scala."""

from __future__ import annotations

import pytest

from biocache_store_spark.parsers.gridref import (
    grid_ref_as_resolutions,
    grid_reference_to_easting_northing,
    process_grid_reference,
)

OSGB_CASES = {
    "NM39": (130000, 790000, 10000, 140000, 800000),
    "NM4099": (140000, 799000, 1000, 141000, 800000),
    "NG316005": (131600, 800500, 100, 131700, 800600),
    "NM39A": (130000, 790000, 2000, 132000, 792000),
    "NM39E": (130000, 798000, 2000, 132000, 800000),
    "NM39G": (132000, 792000, 2000, 134000, 794000),
    "NM39S": (136000, 794000, 2000, 138000, 796000),
    "NM39N": (134000, 796000, 2000, 136000, 798000),
    "NM39P": (134000, 798000, 2000, 136000, 800000),
    "NM39Z": (138000, 798000, 2000, 140000, 800000),
}


@pytest.mark.parametrize("ref", OSGB_CASES)
def test_osgb_easting_northing(ref):
    e, n, u, max_e, max_n = OSGB_CASES[ref]
    g = grid_reference_to_easting_northing(ref)
    assert g is not None
    assert (g.easting, g.northing) == (e, n)
    assert g.coordinate_uncertainty == u
    assert (g.max_easting, g.max_northing) == (max_e, max_n)
    assert g.datum == "EPSG:27700"


def test_irish_grid():
    r1 = process_grid_reference("J4967")
    assert f"{r1.min_latitude}" == "54.52944"
    assert f"{r1.min_longitude}" == "-5.69914"
    r2 = process_grid_reference("IJ4967")  # redundant I prefix
    assert f"{r2.min_latitude}" == "54.52944"
    r3 = process_grid_reference("H99")
    assert (r3.easting, r3.northing) == (290000, 390000)
    assert f"{r3.latitude}" == "54.79388"
    assert f"{r3.longitude}" == "-6.5238"


def test_osgb_to_wgs84():
    r = process_grid_reference("NM39")
    assert f"{r.latitude}" == "56.97001"
    assert f"{r.longitude}" == "-6.36199"
    assert r.datum == "EPSG:4326"
    assert r.coordinate_uncertainty == 10000


@pytest.mark.parametrize(
    "ref,expected",
    [
        ("NH123123", {"grid_ref_100000": "NH", "grid_ref_10000": "NH11",
                      "grid_ref_1000": "NH1212", "grid_ref_100": "NH123123"}),
        ("NH12341234", {"grid_ref_100000": "NH", "grid_ref_10000": "NH11",
                        "grid_ref_1000": "NH1212", "grid_ref_100": "NH123123"}),
        ("J12341234", {"grid_ref_100000": "J", "grid_ref_10000": "J11",
                       "grid_ref_1000": "J1212", "grid_ref_100": "J123123"}),
    ],
)
def test_resolutions(ref, expected):
    out = grid_ref_as_resolutions(ref)
    for key, value in expected.items():
        assert out[key] == value


def test_resolutions_with_tetrad():
    out = grid_ref_as_resolutions("NH1234512345")
    assert out["grid_ref_2000"] == "NH11G"
    out2 = grid_ref_as_resolutions("J43214321")
    assert out2["grid_ref_2000"] == "J44G"


@pytest.mark.parametrize("bad", ["", "1234", "NM3", "II99", None, "NM39O"])
def test_invalid_refs(bad):
    assert grid_reference_to_easting_northing(bad) is None


QUAD_CASES = {
    # quadrant = centre of the 5km quarter-square, uncertainty 5000
    # (GridUtil.scala:446-476 branch body; see _apply_subcell note)
    "NM39NW": (132500, 797500, 5000),
    "NM39NE": (137500, 797500, 5000),
    "NM39SW": (132500, 792500, 5000),
    "NM39SE": (137500, 792500, 5000),
    # 2-digit-pair quadrant: 500m cell, uncertainty 500. NOTE the digit
    # groups must be space-separated — greedy regex backtracking otherwise
    # splits "4099" into "409"/"9" and the length check rejects it, in the
    # reference exactly as here
    "NM 40 99 NE": (140750, 799750, 500),
}


@pytest.mark.parametrize("ref", QUAD_CASES)
def test_quadrant_refs(ref):
    e, n, u = QUAD_CASES[ref]
    g = grid_reference_to_easting_northing(ref)
    assert g is not None
    assert (g.easting, g.northing, g.coordinate_uncertainty) == (e, n, u)


def test_tetrad_on_finer_refs():
    # tetrads qualify any precision, with cell = accuracy/5
    # (GridUtil.scala:420-444): 2-digit pairs -> 200 m cells (digit groups
    # spaced, as in the reference — see the quadrant note above)
    g = grid_reference_to_easting_northing("NM 40 99 A")
    assert (g.easting, g.northing, g.coordinate_uncertainty) == (140000, 799000, 200)
    g = grid_reference_to_easting_northing("NM 40 99 Z")
    assert (g.easting, g.northing, g.coordinate_uncertainty) == (140800, 799800, 200)
    # unspaced multi-pair tetrad/quad refs are rejected (regex backtracking
    # yields unequal digit groups), faithfully to the reference
    assert grid_reference_to_easting_northing("NM4099A") is None
    assert grid_reference_to_easting_northing("NM4099NE") is None


@pytest.mark.parametrize("ref,tetrad_key", [("J43G", "J43G"), ("C12Q", "C12Q"), ("NH12Q", "NH12Q")])
def test_dogfood_resolutions(ref, tetrad_key):
    # GridReferenceTest.scala "Dogfood at different resolutions": rebuild the
    # full-precision ref from the parsed easting/northing, re-derive the
    # tetrad at 2km resolution
    g = grid_reference_to_easting_northing(ref)
    rebuilt = g.grid_letters + str(g.easting)[1:] + str(g.northing)[1:]
    out = grid_ref_as_resolutions(rebuilt)
    assert out["grid_ref_100000"] == ref[: len(g.grid_letters)]
    assert out["grid_ref_2000"] == tetrad_key


def test_resolutions_gated_on_uncertainty():
    # 10m ref: all resolutions incl. tetrad (GridUtil.scala:186-200)
    out = grid_ref_as_resolutions("HY489020")
    assert out["grid_ref_10000"] == "HY40"
    assert out["grid_ref_2000"] == "HY40W"
    assert out["grid_ref_1000"] == "HY4802"
    assert out["grid_ref_100"] == "HY489020"
    # 10km ref: no finer resolutions
    out = grid_ref_as_resolutions("HU35")
    assert out["grid_ref_10000"] == "HU35"
    assert "grid_ref_1000" not in out and "grid_ref_2000" not in out
    # tetrad ref: down to 2km only
    out = grid_ref_as_resolutions("NM39G")
    assert out["grid_ref_2000"] == "NM39G"
    assert "grid_ref_1000" not in out
    # letters only
    assert grid_ref_as_resolutions("NH") == {"grid_ref_100000": "NH"}


def test_irish_lax_odd_digits():
    # the Irish path performs no easting/northing length validation
    # (GridUtil.scala:236-335); odd-digit refs parse with null uncertainty
    g = grid_reference_to_easting_northing("A123")
    assert g is not None
    assert g.coordinate_uncertainty is None
    assert (g.easting, g.northing) == (10000, 423000)


def test_grid_ref_as_resolutions_reference_matrix():
    # GridReferenceTest.scala:83-205 — every asserted key/value
    from biocache_store_spark.parsers.gridref import grid_ref_as_resolutions as g

    cases = [
        ("NH123123", {"grid_ref_100000": "NH", "grid_ref_10000": "NH11",
                      "grid_ref_1000": "NH1212", "grid_ref_100": "NH123123"}),
        ("NH12341234", {"grid_ref_100000": "NH", "grid_ref_10000": "NH11",
                        "grid_ref_1000": "NH1212", "grid_ref_100": "NH123123"}),
        ("NH1234512345", {"grid_ref_100000": "NH", "grid_ref_10000": "NH11",
                          "grid_ref_2000": "NH11G", "grid_ref_1000": "NH1212",
                          "grid_ref_100": "NH123123"}),
        ("J12341234", {"grid_ref_100000": "J", "grid_ref_10000": "J11",
                       "grid_ref_1000": "J1212", "grid_ref_100": "J123123"}),
        ("J43214321", {"grid_ref_100000": "J", "grid_ref_10000": "J44",
                       "grid_ref_2000": "J44G", "grid_ref_1000": "J4343",
                       "grid_ref_100": "J432432"}),
        ("J11", {"grid_ref_100000": "J", "grid_ref_10000": "J11"}),
        ("J", {"grid_ref_100000": "J"}),
        ("NH", {"grid_ref_100000": "NH"}),
        ("NF8359", {"grid_ref_100000": "NF", "grid_ref_10000": "NF85",
                    "grid_ref_1000": "NF8359"}),
        ("HU35", {"grid_ref_100000": "HU", "grid_ref_10000": "HU35"}),
        ("HY489020", {"grid_ref_100000": "HY", "grid_ref_10000": "HY40",
                      "grid_ref_1000": "HY4802", "grid_ref_100": "HY489020"}),
    ]
    for ref, want in cases:
        got = g(ref)
        for k, v in want.items():
            assert got.get(k) == v, (ref, k, got)
