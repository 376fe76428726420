"""Collector (recordedBy) name normalization.

Port of parser/CollectorNameParser.scala:6-162: normalizes the many shapes
collector names arrive in ("Smith, J.", "J. Smith", "SMITH A.C. Tony",
"Keith & Lindsay Fisher", '"KENNY S.D. Sue""WALLACE-WARD D. Di"') into
canonical "Surname, I.N. Firstname" strings, recognizing organisations and
unknown/anonymous markers.

Pattern cascade order and the surname/initials/prefix capture-group logic
follow the reference exactly (parse: CollectorNameParser.scala:121-132,
parseForList: :41-119, generateName: :134-160). Scala's pattern match is a
full-string match, hence re.fullmatch throughout. The JVM \\p{Lu}/\\p{Ll}
classes are approximated with Latin-1 ranges.
"""

from __future__ import annotations

import functools as _functools
import re

UNKNOWN = "UNKNOWN OR ANONYMOUS"

_LU = "A-ZÀ-ÖØ-Þ"  # \p{Lu} approximation
_LL = "a-zß-öø-ÿ"  # \p{Ll} approximation
NAME_LETTERS = _LU

_NA = r"[nN]/[aA]|\([\x00-\x7F\s]*?\)"
_TITLES = r"Dr|DR|dr|\(Professor\)|Mr|MR|mr|Mrs|mrs|MRS|Ms|ms|MS|Lieutenant"
_ET_AL = r"[eE][tT][. ] ?[aA][Ll][. ]?"
_INITIALS = r"((?:[A-Z][-. ]? ?){0,4})"

_ORGANISATION_WORDS = (
    r"collection|Entomology|University|Oceanographic|Indonesia|Division|"
    r"American|Photographic|SERVICE|Section|Arachnology|Northern|Institute|"
    r"Ichthyology|AUSTRALIA|Malacology|Institution|Department|Survey|DFO|"
    r"Society|FNS-\(SA\)|Association|Government|COMMISSION|Department|"
    r"Conservation|Expedition|NPWS-\(SA\)|Study Group|DIVISION|Melbourne|"
    r"ATLAS|summer parties|Macquarie Island|NSW|Australian|Museum|"
    r"Herpetology|ORNITHOLOGICAL|ASSOCIATION|SURVEY|Fisheries|Queensland|"
    r"Griffith Npws|NCS-\(SA\)|UNIVERSITY|SCIENTIFIC|Ornithologists|"
    r"Bird Observation|CMAR|Kangaroo Management Program"
)

_SURNAME_PREFIXES = (
    "ben|da|Da|Dal|de|De|del|Del|den|der|Di|du|e|la|La|Le|Mc|San|St|Ste|"
    "van|Van|Vander|vel|von|Von"
)
_PREFIX = rf"((?:(?:{_SURNAME_PREFIXES})(?:[. ]|$)){{0,2}})"

_INITIALS_SURNAME = re.compile(
    rf"(?:(?:{_TITLES})(?:[. ]|$))?{_INITIALS}[. ]([{_LU}{_LL}'-]*) ?"
    rf"(?:(?:{_TITLES})(?:[. ]|$)?)?(?:{_ET_AL})?"
)
_SURNAME_FIRSTNAME = re.compile(
    rf"\"?([{_LU}'-]*) ((?:[A-Z][-. ] ?){{0,4}}) ?([{_LU}{_LL}']*)(?: {_NA})?\"?"
)
_SURNAME_PUNC_FIRSTNAME = re.compile(
    rf"\"?{_PREFIX}([{_LU}{_LL}'-]*) ?[,] ?(?:(?:{_TITLES})(?:[. ]|$))? ?"
    rf"((?:[A-Z][-. ] ?){{0,4}}) ?{_PREFIX}([{_LU}{_LL}']*)? ?"
    rf"([{_LU}{_LL}']{{3,}})? ?((?:[A-Z][. ]? ?){{0,4}}){_PREFIX}(?: {_NA})?\"?"
)
_SINGLE_NAME = re.compile(rf"(?:(?:{_TITLES})(?:[. ]|$))?([{_LU}{_LL}']*)")
_ORGANISATION = re.compile(rf"((?:.*?)?(?:{_ORGANISATION_WORDS})(?:.*)?)")
_AND = "AND|and|And|&"
_COLLECTOR_DELIM = re.compile(r';|""|\|| - ')
_COMMA_LIST = re.compile(r",|&")
_AND_NAME_LIST = re.compile(
    rf"((?:[A-Z][. ] ?){{0,3}})([{NAME_LETTERS}][{_LL}\-']*)? ?"
    rf"([{NAME_LETTERS}][{_LL}{_LU}'-]*)? ?(?:{_AND}) ?"
    rf"((?:[A-Z][. ] ?){{0,3}})([{NAME_LETTERS}][{_LL}'-]*)? ?"
    rf"([{NAME_LETTERS}][{_LL}{_LU}'-]*)?"
)
_FIRSTNAME_SURNAME = re.compile(
    rf"([{NAME_LETTERS}][{_LL}']*) ((?:[A-Z][. ] ?){{0,4}}) ?"
    rf"([{_LU}{_LL}'-]*)? ?(?:{_NA})?"
)
_UNKNOWN_PATTERNS = re.compile(
    r"(\"?ANON  N/A\"?|\"NOT ENTERED[ ]*-[ ]*SEE ORIGINAL DATA[ ]*-[ ]*\"|"
    r"\[unknown\]|Anon\.|No data|Unknown|Anonymous|\?)"
)


def _capitalize_surname(s: str) -> str:
    """WordUtils.capitalize(lowercased, '-', '\\''): capitalize the first
    letter and every letter following '-' or '\\''."""
    out = []
    cap = True
    for ch in s.lower():
        out.append(ch.upper() if cap else ch)
        cap = ch in ("-", "'")
    return "".join(out)


def generate_name(
    first_name: str | None,
    surname: str | None,
    initials: str | None,
    middle_name: str | None = None,
    surname_prefix: str | None = None,
) -> str:
    """CollectorNameParser.generateName (CollectorNameParser.scala:134-160)."""
    name = ""
    if surname_prefix:
        name += surname_prefix.strip() + " "
    if surname is not None:
        name += _capitalize_surname(surname)
    if initials and initials.strip():
        name += ", "
        newinit = re.sub(rf"[^{_LU}{_LL}-]", "", initials.strip())
        for c in newinit:
            name += c + "."
        name = name.replace(".-.", "-")
    if first_name and first_name.strip():
        if not (initials and initials.strip()):
            name += ", " + first_name[0].upper() + "."
            if middle_name and middle_name.strip():
                name += middle_name[0].upper() + "."
        name += " " + first_name.lower().capitalize()
    return name.strip()


def parse(s: str | None) -> str | None:
    """Single-name parse — CollectorNameParser.scala:121-132 cascade."""
    if s is None:
        return None
    if _UNKNOWN_PATTERNS.fullmatch(s):
        return UNKNOWN
    m = _ORGANISATION.fullmatch(s)
    if m:
        return m.group(1)
    m = _INITIALS_SURNAME.fullmatch(s)
    if m:
        return generate_name(None, m.group(2), m.group(1))
    m = _SURNAME_FIRSTNAME.fullmatch(s)
    if m:
        return generate_name(m.group(3), m.group(1), m.group(2))
    m = _SURNAME_PUNC_FIRSTNAME.fullmatch(s)
    if m:
        prefix, surname, initials, prefix2, firstname, middlename, initials2, prefix3 = (
            m.group(1),
            m.group(2),
            m.group(3),
            m.group(4),
            m.group(5),
            m.group(6),
            m.group(7),
            m.group(8),
        )
        chosen_initials = initials2 if not (initials and initials.strip()) else initials
        chosen_prefix = (
            prefix3
            if prefix3 and prefix3.strip()
            else prefix2
            if prefix2 and prefix2.strip()
            else prefix
        )
        return generate_name(firstname, surname, chosen_initials, middlename, chosen_prefix)
    m = _FIRSTNAME_SURNAME.fullmatch(s)
    if m:
        return generate_name(m.group(1), m.group(3), m.group(2))
    m = _SINGLE_NAME.fullmatch(s)
    if m:
        return generate_name(None, m.group(1), None)
    return None


def parse_for_list(s: str | None) -> list[str] | None:
    """Multi-collector parse — CollectorNameParser.scala:41-119. Memoized
    through a tuple-returning inner (collector strings repeat heavily);
    callers get a fresh list each time."""
    if s is None:
        return None
    cached = _parse_for_list_cached(s)
    return None if cached is None else list(cached)


@_functools.lru_cache(maxsize=65536)
def _parse_for_list_cached(s: str) -> tuple[str, ...] | None:
    if s is None:
        return None
    result: list[str] | None = None
    m = _AND_NAME_LIST.fullmatch(s)
    if m:
        initials1, first, second, initials2, third, forth = (
            m.group(1) or "",
            m.group(2) or "",
            m.group(3) or "",
            m.group(4) or "",
            m.group(5) or "",
            m.group(6) or "",
        )
        if not second:
            if not forth and not initials1:
                result = [
                    generate_name(None, first, initials1),
                    generate_name(None, third, initials2),
                ]
            elif initials1 and first and third:
                result = [
                    generate_name(None, first, initials1),
                    generate_name(None, third, initials2),
                ]
            elif initials1 and initials2:
                result = [
                    generate_name(None, third, initials1),
                    generate_name(None, third, initials2),
                ]
            else:
                result = [
                    generate_name(first, forth, initials1),
                    generate_name(third, forth, initials2),
                ]
        else:
            if not forth:
                result = [
                    generate_name(first, second, initials1),
                    generate_name(None, third, initials2),
                ]
            else:
                result = [
                    generate_name(first, second, initials1),
                    generate_name(third, forth, initials2),
                ]
    elif _UNKNOWN_PATTERNS.fullmatch(s):
        result = [UNKNOWN]
    else:
        parts = _COLLECTOR_DELIM.split(s)
        if len(parts) > 1:
            result = [parse(p.strip()) for p in parts]
        else:
            single = parse(s)
            if single is not None:
                return [single]
            parts = _COMMA_LIST.split(s)
            if len(parts) > 1:
                result = [parse(p.strip()) for p in parts]
            else:
                result = [s]
    if result is None:
        return None
    sanitised = [
        e for e in result if e is not None and e.strip() and e.strip().lower() != "null"
    ]
    return sanitised or None
