"""Dimension-refresh loaders feeding the chain's enrich/SDS operators
(ConservationListLoader / HabitatLoader in load/TaxonProfileLoader.scala,
UpdateAttribution in tool/UpdateAttribution.scala)."""

from __future__ import annotations


def _write_csv(path, header, rows):
    with open(path, "w") as fh:
        fh.write(header + "\n")
        for r in rows:
            fh.write(r + "\n")
    return str(path)


def test_classification_enrich_from_loaded_profiles(spark, tmp_path):
    from biocache_store_spark.processors.chain import enrich_classification
    from biocache_store_spark.sources.dim_loader import load_taxon_profiles

    path = _write_csv(
        tmp_path / "profiles.csv",
        "scientificName,taxonConceptID,taxonRank,lft,rgt,vernacularName,kingdom",
        [
            "Osphranter rufus,urn:1,species,100,101,Red Kangaroo,Animalia",
            "Thalia major,urn:2,species,200,201,,Plantae",
        ],
    )
    taxa = load_taxon_profiles(spark, path)
    assert dict(taxa.dtypes)["lft"] == "int"
    records = spark.createDataFrame(
        [("o1", "Osphranter rufus"), ("o2", "Nullius nomen")],
        "occurrenceID string, scientificName string",
    )
    out = {r["occurrenceID"]: r for r in enrich_classification(records, taxa).collect()}
    assert out["o1"]["matched_taxonConceptID"] == "urn:1"
    assert out["o1"]["matched_lft"] == 100
    assert out["o2"]["matched_taxonConceptID"] is None


def test_sds_from_loaded_conservation_list(spark, tmp_path):
    from biocache_store_spark.processors.sds import apply_sds
    from biocache_store_spark.sources.dim_loader import load_conservation_list

    path = _write_csv(
        tmp_path / "conservation.csv",
        "scientificName,status,region,generalisation,authority",
        [
            "Wollemia nobilis,Critically Endangered,,10000m,NSW OEH",
        ],
    )
    rules = load_conservation_list(spark, path)
    records = spark.createDataFrame(
        [("o1", "Wollemia nobilis", "-33.123456", "150.654321"),
         ("o2", "Macropus rufus", "-35.2", "144.8")],
        "occurrenceID string, scientificName string, decimalLatitude string,"
        " decimalLongitude string",
    )
    out = {
        r["occurrenceID"]: r
        for r in apply_sds(records, rules, id_col="occurrenceID").collect()
    }
    assert out["o1"]["sensitive"]
    assert out["o1"]["decimalLatitude"] == "-33.1"  # blurred to the 10km grid
    assert out["o1"]["sds_category"] == "Critically Endangered"
    assert not out["o2"]["sensitive"]


def test_habitat_dim_marine_terrestrial(spark, tmp_path):
    from biocache_store_spark.sources.dim_loader import load_habitat_dim

    path = _write_csv(
        tmp_path / "irmng.csv",
        "guid,isMarine",
        ["urn:1,true", "urn:2,false", ",true"],
    )
    out = {r["taxonConceptID"]: r["habitats"] for r in load_habitat_dim(spark, path).collect()}
    assert out == {"urn:1": "Marine", "urn:2": "Terrestrial"}


def test_attribution_from_loaded_dim(spark, tmp_path):
    from biocache_store_spark.processors.enrichment import enrich_attribution
    from biocache_store_spark.sources.dim_loader import load_attribution_dim

    path = _write_csv(
        tmp_path / "collectory.csv",
        "dataResourceUid,dataResourceName,dataProviderUid,dataProviderName,dataHubUid",
        ["dr1,Fish Collection,dp1,Provider,hub1;hub2", "dr2,Other,dp2,P2,"],
    )
    dims = load_attribution_dim(spark, path)
    records = spark.createDataFrame(
        [("o1", "dr1"), ("o2", "dr2")],
        "occurrenceID string, dataResourceUid string",
    )
    out = {r["occurrenceID"]: r for r in enrich_attribution(records, dims).collect()}
    assert out["o1"]["attr_dataResourceName"] == "Fish Collection"
    assert out["o1"]["attr_dataHubUid"] == ["hub1", "hub2"]
    assert out["o2"]["attr_dataHubUid"] == []


def test_cli_load_dim(spark, tmp_path):
    from biocache_store_spark.cli import main

    src = _write_csv(
        tmp_path / "c.csv",
        "scientificName,status,region,generalisation,authority",
        ["Wollemia nobilis,CR,,10000m,X"],
    )
    out = str(tmp_path / "dim")
    assert main(["load-dim", "--in", src, "--kind", "conservation", "--out", out]) == 0
    rows = spark.read.parquet(out).collect()
    assert rows[0]["category"] == "CR" and rows[0]["generalisation"] == "10000m"
