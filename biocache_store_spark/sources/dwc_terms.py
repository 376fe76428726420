"""Darwin Core term registry for header mapping.

The reference maps arbitrary CSV headers / DwC URIs to canonical terms via
its DwC vocabulary (load/DwcCSVLoader.scala:343 header mapping, vocab DwC).
This registry is authored from the public Darwin Core standard
(https://dwc.tdwg.org/terms/): canonical term -> accepted variants. Headers
are normalized (non-alphanumerics stripped, lowercased) before lookup, so
"Decimal Latitude", "decimal_latitude" and the URI suffix all resolve.
"""

from __future__ import annotations

from biocache_store_spark.parsers.vocab import Vocab

DWC_URI_PREFIXES = (
    "http://rs.tdwg.org/dwc/terms/",
    "http://purl.org/dc/terms/",
    "http://rs.gbif.org/terms/1.0/",
)

_TERMS: dict[str, list[str]] = {
    "occurrenceID": ["occurrence id", "id"],
    "catalogNumber": ["catalogue number", "catalog no"],
    "recordNumber": ["field number", "collector number"],
    "institutionCode": ["institution"],
    "collectionCode": ["collection"],
    "basisOfRecord": ["basis of record"],
    "recordedBy": ["collector", "collectors", "recorded by"],
    "individualCount": ["individual count", "abundance"],
    "sex": [],
    "lifeStage": ["life stage"],
    "occurrenceStatus": ["occurrence status"],
    "establishmentMeans": ["establishment means"],
    "typeStatus": ["type status"],
    "eventDate": ["event date", "observation date", "date"],
    "eventDateEnd": ["event date end"],
    "verbatimEventDate": ["verbatim event date"],
    "year": [],
    "month": [],
    "day": [],
    "eventTime": ["event time"],
    "decimalLatitude": ["decimal latitude", "latitude", "lat"],
    "decimalLongitude": ["decimal longitude", "longitude", "lon", "lng", "long"],
    "verbatimLatitude": ["verbatim latitude"],
    "verbatimLongitude": ["verbatim longitude"],
    "geodeticDatum": ["geodetic datum", "datum"],
    "verbatimSRS": ["verbatim srs"],
    "coordinateUncertaintyInMeters": [
        "coordinate uncertainty in meters",
        "coordinate uncertainty",
    ],
    "coordinatePrecision": ["coordinate precision"],
    "country": [],
    "countryCode": ["country code"],
    "stateProvince": ["state province", "state", "province"],
    "locality": ["site", "location remarks"],
    "minimumElevationInMeters": ["minimum elevation in meters", "min elevation"],
    "maximumElevationInMeters": ["maximum elevation in meters", "max elevation"],
    "minimumDepthInMeters": ["minimum depth in meters", "min depth"],
    "maximumDepthInMeters": ["maximum depth in meters", "max depth"],
    "scientificName": ["scientific name", "species name", "taxon name"],
    "scientificNameAuthorship": ["scientific name authorship", "author"],
    "kingdom": [],
    "phylum": [],
    "classs": ["class"],  # reference's class/classs remap, FullRecord.scala:123-129
    "order": [],
    "family": [],
    "genus": [],
    "specificEpithet": ["specific epithet"],
    "infraspecificEpithet": ["infraspecific epithet"],
    "taxonRank": ["taxon rank", "rank"],
    "vernacularName": ["vernacular name", "common name"],
    "taxonConceptID": ["taxon concept id", "taxon concept lsid"],
    "identifiedBy": ["identified by", "identifier name"],
    "dateIdentified": ["date identified"],
    "identificationQualifier": ["identification qualifier"],
    "associatedMedia": ["associated media", "image url", "images"],
    "dataGeneralizations": ["data generalizations"],
    "informationWithheld": ["information withheld"],
    "modified": ["last modified", "date last modified"],
    "license": ["licence", "rights"],
    "georeferencedDate": ["georeferenced date"],
    "gridReference": ["grid reference"],
    "easting": [],
    "northing": [],
    "zone": [],
}

DWC = Vocab.of(_TERMS)


def match_term(header: str) -> str | None:
    """Canonical DwC term for a header or term URI, else None."""
    if header is None:
        return None
    h = header.strip()
    for prefix in DWC_URI_PREFIXES:
        if h.startswith(prefix):
            h = h[len(prefix):]
            break
    term = DWC.match_term(h)
    return term.canonical if term else None
