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
