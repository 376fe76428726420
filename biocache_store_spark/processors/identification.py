"""IdentificationQualifierProcessor, OfflineTestProcessor and the
media/interactions/identification half of MiscellaneousProcessor.

Ports:
  * identification-qualifier keyword classification (Certain/Uncertain/
    Not recognised/Not provided) — processor/
    IdentificationQualifierProcessor.scala:26-122, keyword lists from
    src/main/resources/identificationQualifiers.txt with the reference's
    regex construction (word-boundary anchors, "[.]" dots, "(ed)" optional
    suffix, "?" special-cased; uncertain checked before certain);
  * offline-test carry-forward (duplicates/outliers/expert-distance fields
    + the offline assertion codes) — processor/OfflineTestProcessor.scala:11-30,
    offline codes from vocab/AssertionCodes.scala:157;
  * interactions parse from associatedTaxa ("Interaction:Taxon") +
    vocabulary — processor/MiscellaneousProcessor.scala:150-172,
    src/main/resources/interactions.txt;
  * media copy-through (images/sounds/videos) —
    MiscellaneousProcessor.processImages (:176-181);
  * missing-identification + misc-occurrence QAs —
    MiscellaneousProcessor.processIdentification (:122-143) /
    processMiscOccurrence (:63-77).
"""

from __future__ import annotations

import re

from biocache_store_spark.parsers.vocab import Vocab
from biocache_store_spark.processors.assertions import (
    AssertionCodes as C,
)
from biocache_store_spark.processors.assertions import QualityAssertion as QA

CERTAIN = "Certain"
UNCERTAIN = "Uncertain"
NOT_RECOGNISED = "Not recognised"
NOT_PROVIDED = "Not provided"

# identificationQualifiers.txt
_CERTAIN_KEYWORDS = ["certain", "confident", "confirm(ed)", "positive", "verified"]
_UNCERTAIN_KEYWORDS = [
    "?", "cf.", "aff.", "unknown", "not certain", "negative", "uncertain",
    "uncertainty", "incorrect", "possible", "probable", "sp.", "sp",
    "unnamed", "unsure", "forsan", "near", "x", "not sure", "not confirm(ed)",
    "not correct", "unconfirm(ed)",
]


def _keyword_regex(keyword: str) -> str:
    """IdentificationQualifierProcessor.regex (:101-109)."""
    if keyword == "?":
        return r"\?"
    if "." in keyword:
        return (
            r"\b"
            + re.sub(r"\s+", " ", keyword.replace(".", r"\b[.]").replace("(ed)", "(?:ed)?"))
        )
    return (
        r"\b"
        + re.sub(r"\s+", " ", keyword.replace("(ed)", "(?:ed)?"))
        + r"\b"
    )


_CERTAIN_RE = re.compile(
    "((?:.*?)?(?:" + "|".join(_keyword_regex(k) for k in _CERTAIN_KEYWORDS) + ")(?:.*)?)"
)
_UNCERTAIN_RE = re.compile(
    "((?:.*?)?(?:" + "|".join(_keyword_regex(k) for k in _UNCERTAIN_KEYWORDS) + ")(?:.*)?)"
)


def classify_identification_qualifier(value: str | None) -> str:
    """Uncertain keywords win over certain (the reference matches the
    uncertain regex first, IdentificationQualifierProcessor.scala:53-58)."""
    if value is None or not str(value).strip():
        return NOT_PROVIDED
    s = re.sub(r"\s+", " ", str(value).strip()).lower()
    if _UNCERTAIN_RE.fullmatch(s):
        return UNCERTAIN
    if _CERTAIN_RE.fullmatch(s):
        return CERTAIN
    return NOT_RECOGNISED


def process_identification_qualifier(raw: dict, processed: dict) -> list:
    """Stage 11 of the chain."""
    processed["identificationQualifier"] = classify_identification_qualifier(
        raw.get("identificationQualifier")
    )
    if raw.get("abcdIdentificationQualifier") is not None:
        processed["abcdIdentificationQualifier"] = classify_identification_qualifier(
            raw.get("abcdIdentificationQualifier")
        )
    return []


# --- OfflineTestProcessor ------------------------------------------------

# vocab/AssertionCodes.scala:157
OFFLINE_ASSERTION_CODES = (
    C.INFERRED_DUPLICATE_RECORD.code,
    C.SPECIES_OUTSIDE_EXPERT_RANGE.code,
    C.DETECTED_OUTLIER.code,
)

_OFFLINE_FIELDS = (
    "outlierForLayers",
    "duplicationStatus",
    "duplicationType",
    "associatedOccurrences",
    "distanceOutsideExpertRange",
)


def process_offline_tests(
    processed: dict, last_processed: dict | None, last_assertions: list | None
) -> list:
    """Stage 3: carry forward offline-computed results from the previous
    processed version (OfflineTestProcessor.scala:11-30)."""
    if last_processed is None:
        return []
    for fld in _OFFLINE_FIELDS:
        if last_processed.get(fld) is not None:
            processed[fld] = last_processed[fld]
    carried = []
    for qa in last_assertions or []:
        code = qa.code if hasattr(qa, "code") else qa.get("code")
        if code in OFFLINE_ASSERTION_CODES:
            carried.append(qa)
    return carried


def process_reprocessing(processed: dict, last_processed: dict | None) -> list:
    """Stage 12, ReprocessingProcessor (ReprocessingProcessor.scala:18-31):
    when the processed coordinates are unchanged from the previous version,
    retain its sampled el/cl maps (sampling results are expensive and
    coordinate-determined)."""
    if (
        last_processed is not None
        and last_processed.get("decimalLatitude") == processed.get("decimalLatitude")
        and last_processed.get("decimalLongitude") == processed.get("decimalLongitude")
        and (last_processed.get("el") or last_processed.get("cl"))
    ):
        processed["el"] = last_processed.get("el")
        processed["cl"] = last_processed.get("cl")
    return []


# --- Miscellaneous: interactions / media / identification QAs ------------

# src/main/resources/interactions.txt
INTERACTIONS = Vocab.of(
    {
        "DetritivoreOn": [], "Endozoochore": [], "EpiphyticOn": [],
        "HasDetritivore": [], "HasEndozoochore": [], "HasEpiphyte": [],
        "HasInquiline": [], "HasKleptoparasite": [], "HasSaprotroph": [],
        "InfectedBy": [], "Infects": ["host"], "InhabitedBy": [],
        "Inhabits": [], "Inquiline": [], "KleptoparasiticOn": [],
        "Mutualism": [], "OccursWith": [], "PollinatedBy": [],
        "Pollinates": [], "Predates": [], "PreyOf": [], "SaprotrophicOn": [],
    }
)

_INTERACTION_RE = re.compile(r"([A-Za-z]*):([\x00-\x7F\s]*)")


def parse_interaction(raw: str | None) -> str | None:
    """MiscellaneousProcessor.parseInteraction (:170-172)."""
    if raw is None:
        return None
    m = _INTERACTION_RE.fullmatch(raw)
    return m.group(1) if m else None


def process_interactions(raw: dict, processed: dict) -> list:
    """MiscellaneousProcessor.processInteractions (:150-166)."""
    associated = raw.get("associatedTaxa")
    if associated:
        interaction = parse_interaction(str(associated))
        if interaction:
            term = INTERACTIONS.match_term(interaction)
            if term:
                processed["interactions"] = [term.canonical]
    return []


def process_images(raw: dict, processed: dict) -> list:
    """MiscellaneousProcessor.processImages (:176-181): copy the media URL
    lists through (validation/download is the media store's job)."""
    for key in ("images", "sounds", "videos"):
        if raw.get(key) is not None:
            processed[key] = raw[key]
    return []


def process_identification_checks(raw: dict) -> list:
    """MiscellaneousProcessor.processIdentification (:122-143)."""
    assertions = []
    checks = (
        ("identificationQualifier", C.MISSING_IDENTIFICATIONQUALIFIER, "Missing identificationQualifier"),
        ("identifiedBy", C.MISSING_IDENTIFIEDBY, "Missing identifiedBy"),
        ("identificationReferences", C.MISSING_IDENTIFICATIONREFERENCES, "Missing identificationReferences"),
        ("dateIdentified", C.MISSING_DATEIDENTIFIED, "Missing dateIdentified"),
    )
    for key, code, comment in checks:
        if raw.get(key) is None:
            assertions.append(QA.failed(code, comment))
        else:
            assertions.append(QA.passed(code))
    return assertions


def process_misc_occurrence(raw: dict) -> list:
    """MiscellaneousProcessor.processMiscOccurrence (:63-77)."""
    assertions = []
    if not str(raw.get("catalogNumber") or "").strip():
        assertions.append(QA.failed(C.MISSING_CATALOGUENUMBER, "No catalogue number provided"))
    else:
        assertions.append(QA.passed(C.MISSING_CATALOGUENUMBER))
    if str(raw.get("dataGeneralizations") or "").strip():
        assertions.append(QA.failed(C.DATA_ARE_GENERALISED))
    else:
        assertions.append(QA.passed(C.DATA_ARE_GENERALISED))
    return assertions
