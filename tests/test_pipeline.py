"""End-to-end lifecycle: DwC-A -> full pipeline with all dims -> index."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

FIXTURE_DWCA = os.path.join(os.path.dirname(__file__), "fixtures", "test-dwca")


def test_full_ingest(spark):
    from biocache_store_spark.pipeline import Dimensions, ingest
    from biocache_store_spark.sources.dwca import load_archive

    raw = load_archive(spark, FIXTURE_DWCA, "dr0", ["occurrenceID"])
    dims = Dimensions(
        taxa=spark.createDataFrame(
            [("Macropus rufus", "urn:lsid:mr", "species", 10, 11, "Red Kangaroo")],
            "scientificName string, taxonConceptID string, taxonRank string,"
            " lft int, rgt int, vernacularName string",
        ),
        data_resources=spark.createDataFrame(
            [("dr0", "Test Resource", "dp0", "Test Provider", ["hub0"])],
            "dataResourceUid string, dataResourceName string, dataProviderUid string,"
            " dataProviderName string, dataHubUid array<string>",
        ),
        sensitive_species=spark.createDataFrame(
            [("Macropus rufus", "Vulnerable", 10000.0, None)],
            "scientificName string, category string,"
            " generalisationInMetres double, zone string",
        ),
        cl_layers=spark.createDataFrame(
            [("cl_state", "Victoria",
              "POLYGON((141 -39, 150 -39, 150 -34, 141 -34, 141 -39))")],
            "layerID string, name string, wkt string",
        ),
        el_layers=spark.createDataFrame(
            [("el_temp", -35.3, 144.8, 21.5)],
            "layerID string, lat_bin double, lon_bin double, value double",
        ),
    )
    index = ingest(raw, dims, today=dt.date(2026, 8, 13))
    rows = {r["id"]: r for r in index.collect()}
    assert len(rows) == 3

    r1 = rows["urn:occ:1"]
    # sensitivity blurred the kangaroo's coordinates to the 10km grid
    assert r1["latitude"] == -35.2
    assert r1["taxon_concept_lsid"] == "urn:lsid:mr"
    assert r1["common_name"] == "Red Kangaroo"
    assert r1["geospatial_kosher"] is True
    # the emu record is unblurred and carries its exact position
    assert rows["urn:occ:2"]["latitude"] == pytest.approx(-30.1)

    # facet over the final surface
    facets = {
        r["basis_of_record"]: r["cnt"]
        for r in index.groupBy("basis_of_record").agg(F.count("*").alias("cnt")).collect()
    }
    assert facets == {"PreservedSpecimen": 2, "HumanObservation": 1}
