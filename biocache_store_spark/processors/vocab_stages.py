"""Vocabulary-driven processors: basis of record, type status, occurrence
status, establishment means, collector names.

Ports of processor/BasisOfRecordProcessor.scala:22-41,
processor/TypeStatusProcessor.scala:26-47 (word-scan >=4 chars, distinct
canonical list joined with '|'), and the occurrenceStatus /
establishmentMeans / recordedBy parts of
processor/MiscellaneousProcessor.scala:21-178.
"""

from __future__ import annotations

import re

from biocache_store_spark.parsers.collector import parse_for_list
from biocache_store_spark.parsers.license import match_license
from biocache_store_spark.parsers.vocab import (
    BASIS_OF_RECORD,
    ESTABLISHMENT_MEANS,
    OCCURRENCE_STATUS,
    TYPE_STATUS,
)
from biocache_store_spark.processors.assertions import (
    AssertionCodes as C,
)
from biocache_store_spark.processors.assertions import QualityAssertion as QA

_WORD = re.compile(r"[^\W\d_]{4,}", re.UNICODE)
_LIST_DELIM = re.compile(r"[;,|]")


def process_basis_of_record(raw: dict, processed: dict) -> list:
    """BasisOfRecordProcessor.process — default value (if already set by the
    DefaultValuesProcessor) suppresses the missing assertion."""
    value = raw.get("basisOfRecord")
    if value is None or str(value).strip() == "":
        if processed.get("basisOfRecord"):
            return []
        return [QA.failed(C.MISSING_BASIS_OF_RECORD, "Missing basis of record")]
    term = BASIS_OF_RECORD.match_term(str(value))
    if term is None:
        return [
            QA.failed(C.BADLY_FORMED_BASIS_OF_RECORD, "Unrecognised basis of record"),
            QA.passed(C.MISSING_BASIS_OF_RECORD),
        ]
    processed["basisOfRecord"] = term.canonical
    return [
        QA.passed(C.MISSING_BASIS_OF_RECORD),
        QA.passed(C.BADLY_FORMED_BASIS_OF_RECORD),
    ]


def process_type_status(raw: dict, processed: dict) -> list:
    """TypeStatusProcessor.process — scan words of >=4 letters."""
    value = raw.get("typeStatus")
    if value is None or str(value).strip() == "":
        return []
    matches = []
    for word in _WORD.findall(str(value)):
        term = TYPE_STATUS.match_term(word)
        if term is not None and term.canonical not in matches:
            matches.append(term.canonical)
    if not matches:
        return [QA.failed(C.UNRECOGNISED_TYPESTATUS, "Unrecognised type status")]
    processed["typeStatus"] = "|".join(matches)
    return [QA.passed(C.UNRECOGNISED_TYPESTATUS)]


def process_occurrence_status(raw: dict, processed: dict) -> list:
    """MiscellaneousProcessor.processOccurrenceStatus — default 'present'."""
    value = raw.get("occurrenceStatus")
    if value is None or str(value).strip() == "":
        processed["occurrenceStatus"] = "present"
        return [QA.failed(C.ASSUMED_PRESENT_OCCURRENCE_STATUS)]
    term = OCCURRENCE_STATUS.match_term(str(value))
    if term is None:
        processed["occurrenceStatus"] = "unknown"
        return [QA.failed(C.UNRECOGNISED_OCCURRENCE_STATUS)]
    processed["occurrenceStatus"] = term.canonical
    return []


def process_license(raw: dict, processed: dict) -> list:
    """AttributionProcessor.scala:62-80 licence canonicalization: a
    supplied licence string maps through the ordered regex vocabulary
    (parsers/license.py — first match wins, 'Custom' catch-all); a
    missing one keeps the data resource's default licence (set by the
    DefaultValuesProcessor stage). Emits no assertions."""
    value = raw.get("license")
    if value is None or str(value).strip() == "":
        return []
    canonical = match_license(str(value))
    if canonical is not None:
        processed["license"] = canonical
    return []


def process_establishment_means(raw: dict, processed: dict) -> list:
    """MiscellaneousProcessor establishmentMeans — ';'-joined canonicals."""
    value = raw.get("establishmentMeans")
    if value is None or str(value).strip() == "":
        return []
    means = []
    for part in _LIST_DELIM.split(str(value)):
        term = ESTABLISHMENT_MEANS.match_term(part.strip())
        if term is not None and term.canonical not in means:
            means.append(term.canonical)
    if means:
        processed["establishmentMeans"] = "; ".join(means)
    return []


def process_recorded_by(raw: dict, processed: dict) -> list:
    """MiscellaneousProcessor collector-name normalization."""
    value = raw.get("recordedBy")
    if value is None or str(value).strip() == "":
        return []
    names = parse_for_list(str(value))
    if names:
        processed["recordedBy"] = "|".join(names)
        return []
    return [QA.failed(C.RECORDED_BY_UNPARSABLE, f"Can not parse recordedBy {value}")]
