"""Collector-name parser tests — mirrors the reference CollectorParserTest.scala."""

from __future__ import annotations

from biocache_store_spark.parsers.collector import UNKNOWN, parse, parse_for_list


def test_surname_firstname_combinations():
    assert parse("Beauglehole, A.C.") == "Beauglehole, A.C."
    assert parse("Beauglehole, A.C. Atest") == "Beauglehole, A.C. Atest"
    assert parse("Beauglehole, Atest") == "Beauglehole, A. Atest"
    assert parse("Field, Ross P.") == "Field, P. Ross"
    assert parse('"ROBINSON A.C. Tony"') == "Robinson, A.C. Tony"
    assert parse_for_list("GRAHAM K.L. Kate") == ["Graham, K.L. Kate"]
    assert parse_for_list("natasha.carter@csiro.au") == ["natasha.carter@csiro.au"]
    assert parse_for_list("A.G.Gunness et. al.") == ["Gunness, A.G."]


def test_firstname_surname():
    assert parse("Simon Starr") == "Starr, S. Simon"
    assert parse("Simon S.S Starr") == "Starr, S.S. Simon"


def test_surname_initials():
    assert parse_for_list('"WILSON P.J. N/A"') == ["Wilson, P.J."]


def test_hyphen_names():
    assert parse_for_list('"KENNY S.D. Sue""WALLACE-WARD D. Di"') == [
        "Kenny, S.D. Sue",
        "Wallace-Ward, D. Di",
    ]
    assert parse_for_list("Russell-Smith, J.") == ["Russell-Smith, J."]
    assert parse_for_list('"DAVIES R.J-P. Richard"') == ["Davies, R.J-P. Richard"]


def test_title():
    assert parse_for_list("Dittrich, Lieutenant") == ["Dittrich"]


def test_prefix_surnames():
    assert parse_for_list("van Leeuwen, S.") == ["van Leeuwen, S."]
    assert parse_for_list("van der Leeuwen, Simon") == ["van der Leeuwen, S. Simon"]
    assert parse_for_list("Blandowski, J.W.T.L. von") == ["von Blandowski, J.W.T.L."]


def test_ignore_brackets():
    assert parse_for_list('"KINNEAR A.J. (Sandy)"') == ["Kinnear, A.J."]
    assert parse("David Ratkowsky (2589)") == "Ratkowsky, D. David"


def test_initials_then_surname():
    assert parse("NL Kirby") == "Kirby, N.L."
    assert parse_for_list("Annabell, Mr. Graeme R") == ["Annabell, R. Graeme"]
    assert parse_for_list("B Kaspiew (Professor)") == ["Kaspiew, B."]
    assert parse_for_list("Hegedus, Ms Alexandra - Australian Museum - Science") == [
        "Hegedus, A. Alexandra",
        "Australian Museum",
        "Science",
    ]
    assert parse_for_list(
        "Hegedus, Ms Alexandra Danica - Australian Museum - Science"
    ) == ["Hegedus, A.D. Alexandra", "Australian Museum", "Science"]


def test_unknown_anonymous():
    assert parse_for_list("No data") == [UNKNOWN]
    assert parse_for_list("[unknown]") == [UNKNOWN]
    assert parse_for_list('"NOT ENTERED - SEE ORIGINAL DATA  -"') == [UNKNOWN]
    assert parse_for_list('"ANON  N/A"') == [UNKNOWN]


def test_organisations():
    assert parse_for_list("Canberra Ornithologists Group") == [
        "Canberra Ornithologists Group"
    ]
    assert parse_for_list('"SA ORNITHOLOGICAL ASSOCIATION  SAOA"') == [
        '"SA ORNITHOLOGICAL ASSOCIATION  SAOA"'
    ]
    assert parse_for_list("Macquarie Island summer and wintering parties") == [
        "Macquarie Island summer and wintering parties"
    ]
    assert parse("test Australian Museum test") == "test Australian Museum test"
    assert parse_for_list('"NPWS-(SA) N/A"') == ['"NPWS-(SA) N/A"']
    assert parse_for_list('"NOT ENTERED - SEE ORIGINAL DATA -"') == [UNKNOWN]


def test_multiple_collectors():
    assert parse_for_list("Nicole Spillane & Paul Jacobson") == [
        "Spillane, N. Nicole",
        "Jacobson, P. Paul",
    ]
    assert parse_for_list("Keith & Lindsay Fisher") == [
        "Fisher, K. Keith",
        "Fisher, L. Lindsay",
    ]
    assert parse_for_list("Pauline and Arthur Spurgeon") == [
        "Spurgeon, P. Pauline",
        "Spurgeon, A. Arthur",
    ]
    assert parse_for_list("Virginia Andrews-Goff and Jim Spinks") == [
        "Andrews-Goff, V. Virginia",
        "Spinks, J. Jim",
    ]
    assert parse_for_list('"KEMPER C.M. Cath""CARPENTER G.A. Graham"') == [
        "Kemper, C.M. Cath",
        "Carpenter, G.A. Graham",
    ]
    assert parse_for_list("David James, Paul Scofield") == [
        "James, D. David",
        "Scofield, P. Paul",
    ]
    assert parse_for_list("Simmons, J.G.; Simmons, M.H.") == [
        "Simmons, J.G.",
        "Simmons, M.H.",
    ]
    assert parse_for_list("C.Hedley, Mrs.Starkey & H.L.Kesteven") == [
        "Hedley, C.",
        "Starkey",
        "Kesteven, H.L.",
    ]
    assert parse_for_list("N.& V.Gomersall") == ["Gomersall, N.", "Gomersall, V."]


def test_ampersand_initials():
    assert parse_for_list("C. Aedo & C. Ulloa") == ["Aedo, C.", "Ulloa, C."]
