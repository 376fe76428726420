"""Vocab matcher + stemmer tests — behavior mirrors VocabTest.scala."""

from __future__ import annotations

import pytest

from biocache_store_spark.parsers.stemmer import stem
from biocache_store_spark.parsers.vocab import (
    BASIS_OF_RECORD,
    DATE_PRECISION,
    OCCURRENCE_STATUS,
    SEX,
    TYPE_STATUS,
    Vocab,
    normalize,
)


@pytest.mark.parametrize(
    "word,expected",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("cats", "cat"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("conflated", "conflat"),
        ("sized", "size"),
        ("hopping", "hop"),
        ("falling", "fall"),
        ("happy", "happi"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("formalize", "formal"),
        ("electrical", "electr"),
        ("hopefulness", "hope"),
        ("observations", "observ"),
        ("paratypes", "paratyp"),
    ],
)
def test_porter_stemmer(word, expected):
    assert stem(word) == expected


def test_normalize():
    assert normalize("PRESERVED_SPECIMEN") == "preservedspecimen"
    assert normalize("Syntype ?") == "syntype"
    assert normalize("a-b c.d") == "abcd"


def test_basis_of_record():
    assert BASIS_OF_RECORD.canonical("PRESERVED_SPECIMEN") == "PreservedSpecimen"
    assert BASIS_OF_RECORD.canonical("speci") == "PreservedSpecimen"
    assert BASIS_OF_RECORD.canonical("S") == "PreservedSpecimen"
    assert BASIS_OF_RECORD.canonical("PreservedSpecimen") == "PreservedSpecimen"
    assert BASIS_OF_RECORD.canonical("Observation") == "HumanObservation"
    assert BASIS_OF_RECORD.canonical("Observations") == "HumanObservation"  # plural
    assert BASIS_OF_RECORD.canonical("garbage value") is None


def test_type_status():
    assert TYPE_STATUS.canonical("isotype") == "isotype"
    assert TYPE_STATUS.canonical("Syntype ?") == "syntype"
    assert TYPE_STATUS.canonical("Paratype") == "paratype"
    assert TYPE_STATUS.canonical("Paratypes") == "paratype"  # plural via stem


def test_occurrence_status():
    assert OCCURRENCE_STATUS.canonical("Present") == "present"
    assert OCCURRENCE_STATUS.canonical("ABSENT") == "absent"
    assert OCCURRENCE_STATUS.canonical("presence") == "present"


def test_sex_and_precision():
    assert SEX.canonical("Male") == "male"
    assert SEX.canonical("females") == "female"
    # mirrors the reference datePrecision.txt variants exactly
    assert DATE_PRECISION.canonical("D") == "Day"
    assert DATE_PRECISION.canonical("day") == "Day"
    assert DATE_PRECISION.canonical("O") == "Month"
    assert DATE_PRECISION.canonical("Mnth") == "Month"
    assert DATE_PRECISION.canonical("YY") == "Year Range"
    assert DATE_PRECISION.canonical("OO") == "Month Range"
    assert DATE_PRECISION.canonical("DD") == "Day Range"
    assert DATE_PRECISION.canonical("YR") == "Year"


def test_from_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("CanonA\tvar one\tV2\nCanonB\tother\n")
    v = Vocab.from_file(str(p))
    assert v.canonical("var_one") == "CanonA"
    assert v.canonical("OTHER") == "CanonB"
    assert v.canonical("canona") == "CanonA"


# --- ad-hoc CSV column guessing (parser/AdHocParser.scala:182-280) ---

def test_adhoc_guess_headers_from_dwc_row():
    from biocache_store_spark.parsers.adhoc import guess_column_headers

    assert guess_column_headers(
        ["occurrenceID", "scientificName", "decimalLatitude", "country"]
    ) == ["occurrenceID", "scientificName", "decimalLatitude", "country"]


def test_adhoc_guess_headers_from_data_row():
    from biocache_store_spark.parsers.adhoc import guess_column_headers

    assert guess_column_headers(
        ["-35.25", "144.75", "Macropus rufus", "2019-04-01",
         "PreservedSpecimen", "Australia"]
    ) == ["decimalLatitude", "decimalLongitude", "scientificName",
          "eventDate", "basisOfRecord", "country"]


def test_adhoc_sequential_lat_pair_resolved():
    from biocache_store_spark.parsers.adhoc import guess_column_headers

    # two in-range decimals -> parseHead forces (lat, long) on the lead pair
    out = guess_column_headers(["-35.25", "-36.5", "x!!", "?"])
    assert out[:2] == ["decimalLatitude", "decimalLongitude"]


def test_adhoc_value_extractor_ladder():
    from biocache_store_spark.parsers.adhoc import guess_value_term

    assert guess_value_term("WGS84") == "geodeticDatum"
    assert guess_value_term("http://a.org/img/x.jpg") == "associatedMedia"
    assert guess_value_term("holotype") == "typeStatus"
    assert guess_value_term("NM39") == "gridReference"
    assert guess_value_term('35°14\'S') == "verbatimLatitude"
    assert guess_value_term("urn:lsid:x") == "occurrenceID"
    assert guess_value_term("AB-1234") == "catalogNumber"
    assert guess_value_term("100 m") == "coordinateUncertaintyInMeters"
    assert guess_value_term("") == ""


def test_basis_of_record_reference_vocab_parity():
    # VocabTest.scala expectations against the reference basisOfRecord.txt
    assert BASIS_OF_RECORD.canonical("S") == "PreservedSpecimen"
    assert BASIS_OF_RECORD.canonical("DigitisedTrack") == "Sound"
    assert BASIS_OF_RECORD.canonical("Observation") == "HumanObservation"
    assert BASIS_OF_RECORD.canonical("Observations") == "HumanObservation"
    assert BASIS_OF_RECORD.canonical("eDNA") == "EnvironmentalDNA"
    assert BASIS_OF_RECORD.canonical("MaterialSample") == "MaterialSample"
    assert BASIS_OF_RECORD.canonical("mp4") == "Video"
    assert BASIS_OF_RECORD.canonical("jpg") == "Image"


def test_type_status_junk_and_plurals():
    # VocabTest.scala:29,73-80
    assert TYPE_STATUS.canonical("Syntype ?") == "syntype"
    assert TYPE_STATUS.canonical("PARATYPE") == "paratype"
    assert TYPE_STATUS.canonical("Paratypes") == "paratype"


def test_every_canonical_round_trips():
    """Invariant over ALL vocabularies: each term's canonical form matches
    back to itself (no canonical shadowed by another term's variant)."""
    from biocache_store_spark.parsers.vocab import (
        BASIS_OF_RECORD,
        DATE_PRECISION,
        ESTABLISHMENT_MEANS,
        OCCURRENCE_STATUS,
        TYPE_STATUS,
    )

    for vocab in (BASIS_OF_RECORD, DATE_PRECISION, ESTABLISHMENT_MEANS,
                  OCCURRENCE_STATUS, TYPE_STATUS):
        for term in vocab.all:
            m = vocab.match_term(term.canonical)
            assert m is not None and m.canonical == term.canonical, term.canonical


# --- licence vocabulary (vocab/License.scala + license.txt, generated) ---


def test_license_reference_cases():
    from biocache_store_spark.parsers.license import match_license

    # AttributionTest.scala:43-50 ("licence lookup with embedded licence")
    assert match_license("CC-BY Au") == "CC-BY 4.0 (Au)"
    # versioned short codes win their exact row
    assert match_license("CC-BY-NC-SA 3.0 AU") == "CC-BY-NC-SA 3.0 (Au)"
    assert match_license("cc-by-nc 2.5 au") == "CC-BY-NC 2.5 (Au)"
    # long "attribution" spelling family
    assert (
        match_license("Creative Commons Attribution-NonCommercial 4.0 Australia")
        == "CC-BY-NC 4.0 (Au)"
    )
    assert (
        match_license("Attribution-NonCommercial-ShareAlike 3.0 Australia")
        == "CC-BY-NC-SA 3.0 (Au)"
    )
    # no jurisdiction -> the Int 4.0 long-form tail
    assert match_license("Attribution-NoDerivs") == "CC-BY-ND 4.0 (Int)"
    # zero / public domain / catch-all
    assert match_license("CC zero") == "CC0"
    assert match_license("cc0") == "CC0"
    assert match_license("Public Domain Mark") == "PDM"
    assert match_license("all rights reserved") == "Custom"
    assert match_license(None) is None


def test_license_table_structure():
    """The generated table mirrors license.txt: 97 ordered rows, the 1.0
    ND-NC naming quirk, optional 4.0 versions, Custom catch-all last."""
    import re

    from biocache_store_spark.parsers.license import LICENSE_TABLE

    assert len(LICENSE_TABLE) == 97
    names = [n for n, _ in LICENSE_TABLE]
    assert names[0] == "CC-BY-NC-SA 3.0 (Au)"
    assert "CC-BY-ND-NC 1.0 (Au)" in names and "CC-BY-NC-ND 1.0 (Au)" not in names
    assert names[-1] == "Custom" and LICENSE_TABLE[-1][1] == ".*"
    # every regex compiles case-insensitively
    for _, rx in LICENSE_TABLE:
        re.compile(rx, re.IGNORECASE)
    # first-match ordering: the NC-SA row outranks NC and SA rows, so a
    # combined string never degrades to a single-clause canonical
    assert match_first(LICENSE_TABLE, "cc by nc sa 3.0 au") == "CC-BY-NC-SA 3.0 (Au)"


def match_first(table, s):
    import re

    for name, rx in table:
        if re.compile(rx, re.IGNORECASE).search(s):
            return name
    return None


def test_license_stage_semantics():
    from biocache_store_spark.processors.vocab_stages import process_license

    processed = {"license": "CC-BY 4.0 (Au)"}  # resource default from stage 1
    assert process_license({"license": None}, processed) == []
    assert processed["license"] == "CC-BY 4.0 (Au)"  # default kept
    assert process_license({"license": "CC-BY-NC 3.0 au"}, processed) == []
    assert processed["license"] == "CC-BY-NC 3.0 (Au)"  # supplied wins
    assert process_license({"license": "bespoke terms"}, processed) == []
    assert processed["license"] == "Custom"


def test_adhoc_reference_cases_verbatim_dms_pair():
    """AdhocParsingTest.scala:10-27: a verbatim DMS pair is recognized as
    verbatimLatitude/verbatimLongitude, and any 2-value row yields 2
    headers."""
    from biocache_store_spark.parsers.adhoc import guess_column_headers

    assert len(guess_column_headers(["dsads", "sdas"])) == 2
    headers = guess_column_headers(["-37º 3' 48'' S", "149º 54' 14'' E"])
    assert len(headers) == 2
    assert headers == ["verbatimLatitude", "verbatimLongitude"]


def test_occurrence_status_reference_cases():
    """OccurrenceStatusTest.scala:14-82: canonicals for present/absent/
    absence; blank assumes present with ASSUMED_PRESENT; unrecognised
    sets unknown with UNRECOGNISED."""
    from biocache_store_spark.processors.assertions import AssertionCodes as C
    from biocache_store_spark.processors.vocab_stages import (
        process_occurrence_status,
    )

    for raw_value, canonical in [
        ("Present", "present"), ("Absent", "absent"), ("Absence", "absent"),
    ]:
        processed: dict = {}
        qas = process_occurrence_status({"occurrenceStatus": raw_value}, processed)
        assert qas == [] and processed["occurrenceStatus"] == canonical

    processed = {}
    qas = process_occurrence_status({}, processed)
    assert processed["occurrenceStatus"] == "present"
    assert [q.code for q in qas] == [C.ASSUMED_PRESENT_OCCURRENCE_STATUS.code]

    processed = {}
    qas = process_occurrence_status({"occurrenceStatus": "12321321321"}, processed)
    assert processed["occurrenceStatus"] == "unknown"
    assert [q.code for q in qas] == [C.UNRECOGNISED_OCCURRENCE_STATUS.code]
