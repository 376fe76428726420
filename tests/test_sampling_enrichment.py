"""Spatial sampling join + attribution/sensitivity enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biocache_store_spark.operators.sampling import (
    parse_wkt_polygon,
    point_in_polygon,
)


def test_wkt_parsing():
    ring = parse_wkt_polygon("POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))")
    assert ring[0] == (140.0, -40.0)
    assert len(ring) == 5
    with pytest.raises(ValueError):
        parse_wkt_polygon("LINESTRING(0 0, 1 1)")


def test_point_in_polygon():
    ring = parse_wkt_polygon("POLYGON((140 -40, 150 -40, 150 -30, 140 -30, 140 -40))")
    assert point_in_polygon(145.0, -35.0, ring)
    assert not point_in_polygon(139.0, -35.0, ring)
    assert not point_in_polygon(145.0, -29.0, ring)
    # non-convex polygon
    ring2 = parse_wkt_polygon(
        "POLYGON((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))"
    )
    assert point_in_polygon(2.0, 2.0, ring2)
    assert not point_in_polygon(5.0, 9.0, ring2)  # inside the notch


@pytest.fixture(scope="module")
def layers(spark):
    cl = spark.createDataFrame(
        [
            ("cl_state_vic", "Victoria",
             "POLYGON((141 -39, 150 -39, 150 -34, 141 -34, 141 -39))"),
            ("cl_state_nsw", "New South Wales",
             "POLYGON((141 -34, 153.6 -34, 153.6 -28, 141 -28, 141 -34))"),
            ("cl_marine", "Marine",
             "POLYGON((154 -45, 160 -45, 160 -30, 154 -30, 154 -45))"),
        ],
        "layerID string, name string, wkt string",
    )
    el = spark.createDataFrame(
        [
            ("el_temp", -35.3, 144.8, 21.5),
            ("el_temp", -30.1, 150.5, 24.0),
            ("el_rain", -35.3, 144.8, 600.0),
        ],
        "layerID string, lat_bin double, lon_bin double, value double",
    )
    return cl, el


def test_sampling_join(spark, layers):
    from biocache_store_spark.operators.sampling import (
        distinct_points,
        enrich_records,
        sample_points,
    )

    cl, el = layers
    records = spark.createDataFrame(
        [
            ("o1", "-35.21667", "144.81060"),  # Victoria, el bins (-35.3, 144.8)
            ("o2", "-30.1", "150.5"),  # NSW
            ("o3", "-35.21667", "144.81060"),  # duplicate point of o1
            ("o4", None, None),
        ],
        "occurrenceID string, decimalLatitude string, decimalLongitude string",
    )
    pts = distinct_points(records)
    assert pts.count() == 2  # distinct-before-join discipline

    samples = sample_points(pts, cl, el, resolution=0.1)
    srows = {(r["lat"], r["lon"]): r for r in samples.collect()}
    vic = srows[(-35.21667, 144.8106)]
    assert vic["cl"] == {"cl_state_vic": "Victoria"}
    assert vic["el"] == {"el_temp": 21.5, "el_rain": 600.0}
    nsw = srows[(-30.1, 150.5)]
    assert nsw["cl"] == {"cl_state_nsw": "New South Wales"}
    assert nsw["el"] == {"el_temp": 24.0}

    enriched = enrich_records(records, samples)
    out = {r["occurrenceID"]: r for r in enriched.collect()}
    assert out["o1"]["cl"] == {"cl_state_vic": "Victoria"}
    assert out["o3"]["el"]["el_temp"] == 21.5
    assert out["o4"]["cl"] is None


def test_attribution(spark):
    from biocache_store_spark.processors.enrichment import enrich_attribution

    records = spark.createDataFrame(
        [("o1", "dr1"), ("o2", "dr404")],
        "occurrenceID string, dataResourceUid string",
    )
    dim = spark.createDataFrame(
        [("dr1", "Fish Collection", "dp1", "Museum", ["hub1"])],
        "dataResourceUid string, dataResourceName string, dataProviderUid string,"
        " dataProviderName string, dataHubUid array<string>",
    )
    out = {r["occurrenceID"]: r for r in enrich_attribution(records, dim).collect()}
    assert out["o1"]["attr_dataResourceName"] == "Fish Collection"
    assert out["o2"]["attr_dataResourceName"] is None
    codes1 = {a["code"]: a["qa_status"] for a in out["o1"]["assertions"]}
    codes2 = {a["code"]: a["qa_status"] for a in out["o2"]["assertions"]}
    assert codes1[20005] == 1
    assert codes2[20005] == 0


def test_sensitivity(spark):
    from biocache_store_spark.processors.enrichment import (
        apply_sensitivity,
        restore_sensitive_values,
    )

    records = spark.createDataFrame(
        [
            ("o1", "Wollemia nobilis", "-33.123456", "150.654321", "New South Wales"),
            ("o2", "Macropus rufus", "-35.2", "144.8", "Victoria"),
            ("o3", "Wollemia nobilis", None, None, None),
        ],
        "occurrenceID string, scientificName string, decimalLatitude string,"
        " decimalLongitude string, stateProvince string",
    )
    dim = spark.createDataFrame(
        [("Wollemia nobilis", "Critically Endangered", 10000.0, None)],
        "scientificName string, category string, generalisationInMetres double,"
        " zone string",
    )
    out = {r["occurrenceID"]: r for r in apply_sensitivity(records, dim).collect()}
    o1 = out["o1"]
    assert o1["sensitive"] is True
    assert o1["decimalLatitude"] == "-33.1"  # 10km -> 0.1 degree grid
    assert o1["originalSensitiveValues"]["decimalLatitude"] == "-33.123456"
    assert "generalised to 10000m" in o1["dataGeneralizations"]
    assert out["o2"]["sensitive"] is False
    assert out["o2"]["decimalLatitude"] == "-35.2"
    assert out["o3"]["sensitive"] is False  # no coordinates to blur

    # authorised overlay restores the exact values
    restored = {
        r["occurrenceID"]: r
        for r in restore_sensitive_values(
            apply_sensitivity(records, dim)
        ).collect()
    }
    assert restored["o1"]["decimalLatitude"] == "-33.123456"


def test_points_in_polygon_np_bit_identical_to_scalar():
    """The vectorized ray cast must reproduce the scalar point_in_polygon
    EXACTLY — including half-open boundary semantics — across random
    concave rings, open/closed rings, vertex-latitude alignments and
    exact on-edge points. The scalar form stays as the parity oracle."""
    import random

    import numpy as np

    from biocache_store_spark.operators.sampling import (
        point_in_polygon,
        points_in_polygon_np,
    )

    rng = random.Random(9)
    rings = [
        # the fixture rectangle
        [(140.0, -40.0), (150.0, -40.0), (150.0, -30.0), (140.0, -30.0), (140.0, -40.0)],
        # concave (arrowhead), implicitly closed
        [(0.0, 0.0), (10.0, 0.0), (5.0, 4.0), (10.0, 8.0), (0.0, 8.0)],
        # degenerate-ish sliver with a horizontal edge at max latitude
        [(0.0, 0.0), (8.0, 0.0), (8.0, 6.0), (0.0, 6.0)],
    ]
    for _ in range(5):
        n = rng.randint(3, 12)
        rings.append(
            [
                (round(rng.uniform(-20, 20), 3), round(rng.uniform(-20, 20), 3))
                for _ in range(n)
            ]
        )
    for ring in rings:
        pts = [
            (rng.uniform(-25, 25), rng.uniform(-25, 25)) for _ in range(400)
        ]
        # adversarial points: vertices, edge midpoints, vertex-latitude
        # rays, and exact x_cross hits
        for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
            pts.append((x1, y1))
            pts.append(((x1 + x2) / 2.0, (y1 + y2) / 2.0))
            pts.append((x1 - 1.0, y1))
            if y1 != y2:
                lat = (y1 + y2) / 2.0
                x_cross = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
                pts.append((x_cross, lat))
        lon = np.array([p[0] for p in pts], dtype="float64")
        lat = np.array([p[1] for p in pts], dtype="float64")
        got = points_in_polygon_np(lon, lat, ring)
        want = [point_in_polygon(p[0], p[1], ring) for p in pts]
        mism = [i for i in range(len(pts)) if bool(got[i]) != want[i]]
        assert not mism, (ring, [pts[i] for i in mism[:5]])


def test_geometry_kernels_hypothesis_parity():
    """Property widening of the dense geometry parity tests: arbitrary
    rings (tiny/huge coordinates, duplicate vertices, collinear edges)
    and arbitrary points through both vectorized kernels vs their scalar
    oracles — the same class of check that caught the 1-ulp ladder
    parse divergence."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biocache_store_spark.operators.outlier_distribution import (
        distance_outside_m,
        distances_outside_m_np,
    )
    from biocache_store_spark.operators.sampling import (
        point_in_polygon,
        points_in_polygon_np,
    )

    coord = st.one_of(
        st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
        st.integers(min_value=-20, max_value=20).map(float),
        st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False
        ),
    )
    ring_st = st.lists(st.tuples(coord, coord), min_size=3, max_size=9)
    pts_st = st.lists(st.tuples(coord, coord), min_size=1, max_size=40)

    @settings(max_examples=200, deadline=None)
    @given(ring_st, pts_st)
    def case(ring, pts):
        # adversarial extras: ring vertices and edge midpoints as points
        pts = pts + ring[:3] + [
            ((x1 + x2) / 2.0, (y1 + y2) / 2.0)
            for (x1, y1), (x2, y2) in zip(ring, ring[1:])
        ]
        lon = np.array([p[0] for p in pts], dtype=float)
        lat = np.array([p[1] for p in pts], dtype=float)
        vec_in = points_in_polygon_np(lon, lat, ring)
        vec_d = distances_outside_m_np(lon, lat, ring)
        for i, (lo, la) in enumerate(pts):
            assert bool(vec_in[i]) == point_in_polygon(lo, la, ring), (ring, lo, la)
            sd = distance_outside_m(lo, la, ring)
            vd = float(vec_d[i])
            assert vd == sd or (np.isnan(vd) and np.isnan(sd)), (ring, lo, la, vd, sd)

    case()
