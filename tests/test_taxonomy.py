"""Taxonomic name-matching tests — mirror TaxonomicNameTest.scala and
TaxonomicHintsTest.scala against a fixture names dimension."""

from __future__ import annotations

import pytest

from biocache_store_spark.processors.assertions import FAILED, PASSED
from biocache_store_spark.processors.assertions import AssertionCodes as C
from biocache_store_spark.processors.taxonomy import (
    NameIndex,
    construct_scientific_name,
    is_match_valid,
    parse_hints,
    phonetic_key,
    process_classification,
)

NAMES = [
    # accepted species + a synonym pointing at it
    dict(lsid="urn:1", scientificName="Osphranter rufus", taxonRank="species",
         rankID=7000, kingdom="Animalia", phylum="Chordata", classs="Mammalia",
         order="Diprotodontia", family="Macropodidae", genus="Osphranter",
         lft=100, rgt=101, vernacularName="Red Kangaroo"),
    dict(lsid="urn:2", scientificName="Macropus rufus", taxonRank="species",
         rankID=7000, kingdom="Animalia", acceptedLsid="urn:1"),
    # cross-kingdom homonym genus
    dict(lsid="urn:3", scientificName="Thalia", taxonRank="genus", rankID=6000,
         kingdom="Plantae", family="Marantaceae", lft=200, rgt=210),
    dict(lsid="urn:4", scientificName="Thalia", taxonRank="genus", rankID=6000,
         kingdom="Animalia", family="Salpidae", lft=300, rgt=310),
    # cross-rank homonym within one kingdom
    dict(lsid="urn:5", scientificName="Termitoidae", taxonRank="order",
         rankID=4000, kingdom="Animalia", lft=400, rgt=450),
    dict(lsid="urn:6", scientificName="Termitoidae", taxonRank="family",
         rankID=5000, kingdom="Animalia", lft=410, rgt=420),
    # phonetic-tier target
    dict(lsid="urn:7", scientificName="Zabidius novemaculeatus",
         taxonRank="species", rankID=7000, kingdom="Animalia",
         genus="Zabidius", nameType="SCIENTIFIC"),
    # vernacular-only match
    dict(lsid="urn:8", scientificName="Acridotheres tristis", taxonRank="species",
         rankID=7000, kingdom="Animalia", vernacularName="Common Myna"),
    # family for the missing-accepted recursive fallback
    dict(lsid="urn:9", scientificName="Briareidae", taxonRank="family",
         rankID=5000, kingdom="Animalia", phylum="Cnidaria"),
    dict(lsid="urn:10", scientificName="Pseudosuberia genthi", taxonRank="species",
         rankID=7000, kingdom="Animalia", acceptedLsid="urn:gone"),
    # subspecies (rank below species -> subspecies fill)
    dict(lsid="urn:11", scientificName="Osphranter rufus rufus",
         taxonRank="subspecies", rankID=8000, kingdom="Animalia"),
]

INDEX = NameIndex(NAMES)


def qa_status(assertions, code):
    found = [a for a in assertions if a.code == code]
    return found[-1].qa_status if found else None


def test_exact_match_and_synonym_resolution():
    m = INDEX.search({"scientificName": "Macropus rufus"})
    assert m.result["lsid"] == "urn:1"  # synonym resolved to accepted
    assert m.match_type == "exactMatch"


def test_name_not_recognised():
    # TaxonomicNameTest "name not recognised": code 10004 FAILED
    p, a = process_classification({"scientificName": "dummy name"}, INDEX)
    assert qa_status(a, 10004) == FAILED
    assert p["nameMatchMetric"] == "noMatch"


def test_parse_type():
    # TaxonomicNameTest "Parse type"
    p, a = process_classification({"scientificName": "Zabidius novemaculeatus"}, INDEX)
    assert p["nameParseType"] == "SCIENTIFIC"
    assert qa_status(a, C.INVALID_SCIENTIFIC_NAME.code) == PASSED


def test_homonym_unresolved():
    # TaxonomicNameTest "homonym issue": bare Thalia is ambiguous
    p, a = process_classification({"scientificName": "Thalia"}, INDEX)
    assert "homonym" in p["taxonomicIssue"]
    assert qa_status(a, C.HOMONYM_ISSUE.code) == FAILED


def test_homonym_resolved_by_kingdom():
    m = INDEX.search({"scientificName": "Thalia", "kingdom": "Plantae"})
    assert m.result["lsid"] == "urn:3"
    assert m.errors == []


def test_cross_rank_homonym_resolved_by_rank():
    # TaxonomicNameTest "cross rank homonym resolved"
    m = INDEX.search({"scientificName": "Termitoidae"})
    assert m.result is None and "homonym" in m.errors
    m = INDEX.search({"scientificName": "Termitoidae", "taxonRank": "order"})
    assert m.result["lsid"] == "urn:5"
    assert m.result["kingdom"].lower() == "animalia"


def test_canonical_tier_genus_epithet():
    m = INDEX.search(
        {"scientificName": "Osphranter rufus (Desmarest, 1822)",
         "genus": "Osphranter", "specificEpithet": "rufus"}
    )
    assert m.result["lsid"] == "urn:1"
    assert m.match_type == "canonicalMatch"


def test_phonetic_tier():
    # gender-ending variation caught by the phonetic fold
    m = INDEX.search({"scientificName": "Zabidius novemaculeata"})
    assert m.result["lsid"] == "urn:7"
    assert m.match_type == "phoneticMatch"


def test_vernacular_last_resort():
    m = INDEX.search({"vernacularName": "Common Myna"})
    assert m.result["lsid"] == "urn:8"
    assert m.match_type == "vernacularMatch"


def test_fuzzy_tier_epithet_typo():
    # dropped letter in the epithet: not exact/canonical, and the phonetic
    # fold can't repair an internal deletion — fuzzy edit distance can
    m = INDEX.search({"scientificName": "Acridotheres tritis"})
    assert m.result["lsid"] == "urn:8"
    assert m.match_type == "fuzzyMatch"


def test_fuzzy_tier_genus_typo():
    # transposition inside the genus (same 4-char stem block)
    m = INDEX.search({"scientificName": "Osphratner rufus"})
    assert m.result["lsid"] == "urn:1"  # synonym chain NOT involved: direct hit
    assert m.match_type == "fuzzyMatch"


def test_fuzzy_tier_resolves_synonym():
    # misspelled synonym ('rufas': substitution the phonetic fold can't
    # repair — no gender ending to strip): fuzzy hit on Macropus rufus,
    # then the normal synonym -> accepted resolution applies
    m = INDEX.search({"scientificName": "Macropus rufas"})
    assert m.result["lsid"] == "urn:1"
    assert m.match_type == "fuzzyMatch"


def test_fuzzy_tier_distance_cap():
    # three edits: beyond the budget, must NOT match
    m = INDEX.search({"scientificName": "Acridotheres trts"})
    assert m.result is None
    assert m.match_type == "noMatch"


def test_fuzzy_tier_blocking_limits_recall():
    # typo in the first four genus chars falls outside the stem block —
    # documented recall trade of the blocking discipline
    m = INDEX.search({"scientificName": "Scridotheres tristis"})
    assert m.result is None


def test_match_names_spark_fuzzy_tier(spark):
    from biocache_store_spark.processors.taxonomy import match_names_spark

    names = spark.createDataFrame(
        [("l1", "Osphranter rufus", "Animalia"),
         ("l2", "Thalia major", "Plantae"),
         ("l3", "Thalia major", "Animalia")],
        "lsid string, scientificName string, kingdom string",
    )
    records = spark.createDataFrame(
        [("r1", "Osphranter rufas", None, None, None),   # fuzzy hit
         ("r2", "Thalia majr", None, None, None),        # fuzzy tie -> homonym
         ("r3", "Thalia majr", None, None, "Plantae"),   # kingdom resolves tie
         ("r4", "Osphranter xyzzy", None, None, None),   # beyond the budget
         ("r5", "Osphranter rufus", None, None, None)],  # exact tier wins
        "id string, scientificName string, genus string, "
        "specificEpithet string, kingdom string",
    )
    out = {r["id"]: r for r in match_names_spark(records, names).collect()}
    assert out["r1"]["match_type"] == "fuzzyMatch"
    assert out["r1"]["matched_lsid"] == "l1"
    assert out["r2"]["is_homonym"] and out["r2"]["matched_lsid"] is None
    assert out["r3"]["match_type"] == "fuzzyMatch"
    assert out["r3"]["matched_lsid"] == "l2"
    assert out["r4"]["matched_lsid"] is None and not out["r4"]["is_homonym"]
    assert out["r5"]["match_type"] == "exactMatch"

    # fuzzy disabled: r1/r3 fall back to no match
    off = {
        r["id"]: r
        for r in match_names_spark(
            records, names, fuzzy_max_distance=None
        ).collect()
    }
    assert off["r1"]["matched_lsid"] is None
    assert off["r5"]["match_type"] == "exactMatch"


def test_match_names_spark_fans_out_single_partition_records(spark):
    # r12 optimization guard: the ladder's per-row cost (interpreted
    # fuzzy-tier lambdas + levenshtein) is map-only, so a record side read
    # as ONE split would run the whole ladder on one core. The operator
    # must fan the record side out to the session's default parallelism
    # (no-op when the scan already has more splits than cores).
    from biocache_store_spark.processors.taxonomy import match_names_spark

    names = spark.createDataFrame(
        [("l1", "Osphranter rufus", "Animalia")],
        "lsid string, scientificName string, kingdom string",
    )
    records = spark.createDataFrame(
        [(f"r{i}", "Osphranter rufus", None, None, None) for i in range(10)],
        "id string, scientificName string, genus string, "
        "specificEpithet string, kingdom string",
    ).coalesce(1)
    assert records.rdd.getNumPartitions() == 1
    out = match_names_spark(records, names)
    expected = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == expected
    assert out.count() == 10


def test_constructed_name_from_higher_classification():
    # ClassificationDAO.scala:60-86 name construction
    assert construct_scientific_name(
        {"genus": "Osphranter", "specificEpithet": "rufus"}
    ) == "Osphranter rufus"
    assert construct_scientific_name({"family": "Macropodidae"}) == "Macropodidae"
    m = INDEX.search({"genus": "Osphranter", "specificEpithet": "rufus"})
    assert m.result["lsid"] == "urn:1"


def test_missing_accepted_walks_up():
    # TaxonomicNameTest "recursive issue": synonym with a missing accepted
    # concept falls back to the supplied higher classification
    m = INDEX.search(
        {"scientificName": "Pseudosuberia genthi", "genus": "Pseudosuberia",
         "family": "Briareidae", "phylum": "Cnidaria", "kingdom": "Animalia"}
    )
    assert m.result["lsid"] == "urn:9"
    assert m.match_type == "higherMatch"


def test_subspecies_fill():
    # ClassificationDAO.scala:165-169: rank id in (7000, 9999) fills subspecies
    m = INDEX.search({"scientificName": "Osphranter rufus rufus"})
    assert m.result["subspecies"] == "Osphranter rufus rufus"


def test_taxon_id_match():
    m = INDEX.search({"taxonConceptID": "urn:7"})
    assert m.match_type == "taxonIdMatch"


# --- TaxonomicHintsTest.scala ------------------------------------------


def test_parse_hints():
    hint_map = parse_hints(["phylum:A", "phylum:B", "class:N"])
    assert len(hint_map["phylum"]) == 2
    assert len(hint_map["class"]) == 1
    assert "b" in hint_map["phylum"]


def test_hints_no_conflict():
    hint_map = parse_hints(["phylum:A", "kingdom:K", "phylum:B", "kingdom:L", "class:N"])
    assert is_match_valid({"kingdom": "L", "phylum": None}, hint_map)[0]


def test_hints_phylum_mismatch():
    hint_map = parse_hints(["phylum:A", "kingdom:K", "phylum:B", "kingdom:L", "class:N"])
    ok, comment = is_match_valid({"kingdom": "L", "phylum": "C"}, hint_map)
    assert not ok and comment == "Phylum:C"


def test_hints_class_mismatch():
    hint_map = parse_hints(["class:B", "phylum:annelida", "phylum:arthropoda"])
    ok, comment = is_match_valid({"kingdom": "L", "classs": "A"}, hint_map)
    assert not ok and comment == "Class:A"


def test_hints_arthropoda():
    hint_map = parse_hints(["phylum:annelida", "phylum:arthropoda"])
    cl = {"kingdom": "Animalia", "phylum": "Arthropoda", "classs": "Insecta",
          "order": "Coleoptera", "family": "Chrysomelidae", "genus": "Elaphodes"}
    assert is_match_valid(cl, hint_map)[0]


def test_hint_failure_sets_metric_and_assertion():
    p, a = process_classification(
        {"scientificName": "Macropus rufus"}, INDEX,
        taxon_hints=["kingdom:plantae"],
    )
    assert p["nameMatchMetric"] == "matchFailedHint"
    assert qa_status(a, C.RESOURCE_TAXONOMIC_SCOPE_MISMATCH.code) == FAILED
    # the matched classification must NOT be stored on hint failure
    assert "taxonConceptID" not in p


def test_quality_tests():
    _, a = process_classification({"scientificName": "Macropus rufus"}, INDEX)
    assert qa_status(a, C.MISSING_TAXONRANK.code) == FAILED
    assert qa_status(a, C.NAME_NOT_SUPPLIED.code) == PASSED
    _, a = process_classification(
        {"scientificName": "Macropus rufus", "taxonRank": "species",
         "kingdom": "Animalia"}, INDEX)
    assert qa_status(a, C.MISSING_TAXONRANK.code) == PASSED
    assert qa_status(a, C.UNKNOWN_KINGDOM.code) == PASSED
    _, a = process_classification({"kingdom": "NotAKingdom"}, INDEX)
    assert qa_status(a, C.UNKNOWN_KINGDOM.code) == FAILED
    assert qa_status(a, C.NAME_NOT_SUPPLIED.code) == FAILED


def test_phonetic_key_folds():
    assert phonetic_key("novemaculeatus") == phonetic_key("novemaculeata")
    assert phonetic_key("Caeruleus") == phonetic_key("coeruleus")
    assert phonetic_key(None) is None


def test_match_names_spark_fuzzy_in_kingdom_homonym(spark):
    """Two distinct lsids sharing one (name, kingdom) are an in-kingdom
    homonym no hint can resolve — the fuzzy tier must flag it like the
    exact tiers (and the Python NameIndex _resolve) do, not collapse it
    to the min lsid and report a confident typo match."""
    from biocache_store_spark.processors.taxonomy import match_names_spark

    names = spark.createDataFrame(
        [("l1", "Abies alba", "Plantae"),
         ("l2", "Abies alba", "Plantae"),     # same name+kingdom, other lsid
         ("l3", "Abies magnifica", "Plantae")],
        "lsid string, scientificName string, kingdom string",
    )
    records = spark.createDataFrame(
        [("r1", "Abies albax", None, None, None),      # typo -> dup target
         ("r2", "Abies albax", None, None, "Plantae"), # kingdom can't help
         ("r3", "Abies magnifica", None, None, None),  # exact, unaffected
         ("r4", "Abies magnifcia", None, None, None)], # typo -> clean target
        "id string, scientificName string, genus string, "
        "specificEpithet string, kingdom string",
    )
    out = {r["id"]: r for r in match_names_spark(records, names).collect()}
    assert out["r1"]["matched_lsid"] is None and out["r1"]["is_homonym"]
    assert out["r2"]["matched_lsid"] is None and out["r2"]["is_homonym"]
    assert out["r3"]["match_type"] == "exactMatch"
    assert out["r4"]["match_type"] == "fuzzyMatch"
    assert out["r4"]["matched_lsid"] == "l3"
