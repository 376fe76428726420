"""Verbatim latitude/longitude (DMS) parsing.

Port of parser/VerbatimLatLongParser.scala:8-97. Handles:
    30° 01' S / 153° 12' E / 145° 44' 55.85" E / 16° 52' 37" S
    23d 12m 56s S, "145 44 55 E" (no denominators), 145.3°E

The decimal conversion reproduces the reference's fixed-point integer
arithmetic (convertToDecimal, VerbatimLatLongParser.scala:78-96: degrees,
minutes and seconds are scaled by 1e7 and integer-divided) so rounding
matches to the same float.
"""

from __future__ import annotations

import re

_DEG = r"(?:d|deg|degree|degrees|°|º)"
_MIN = r"(?:m|min|minutes|minute|')"
_DIRECTIONS_NEG = ("s", "south", "w", "west")
_DIRECTIONS_LAT = ("s", "south", "n", "north")
_DIRECTIONS_LON = ("w", "west", "e", "east")

# VerbatimLatLongParser.scala:10 — note the reference's second is
# "[0-9]{1,2}.?[0-9]{0,}" (any char as decimal point) and the seconds
# denominator is one-or-two quote characters.
# the reference's leading `(?:[\\-])?` is a CHARACTER CLASS {backslash,
# hyphen} — an optional sign-ish character consumed and ignored (the
# hemisphere letter alone decides the sign). A non-class `\\-` would
# demand a literal backslash+hyphen pair and reject "-30° 01' S".
_VERBATIM = re.compile(
    rf"^(?:[\\-])?([0-9]{{1,3}})(?:{_DEG}\s*)"
    rf"(?:([0-9]{{1,2}})(?:{_MIN}\s*))?"
    rf"(?:([0-9]{{1,2}}(?:[.][0-9]*)?)(?:[\"']{{1,2}}\s*)?)?"
    rf"(s|south|n|north|w|west|e|east)$"
)
_VERBATIM_NO_DENOM = re.compile(
    r"^(?:[\\-])?([0-9]{1,3})\s*"
    r"(?:([0-9]{1,2})\s*)?"
    r"(?:([0-9]{1,2}(?:[.][0-9]*)?)\"?\s*)?"
    r"(s|south|n|north|w|west|e|east)$"
)


def convert_to_decimal(
    degree: str, minute: str | None, second: str | None, direction: str
) -> float | None:
    """Fixed-point conversion matching VerbatimLatLongParser.scala:78-96."""
    try:
        value = int(degree) * 10000000
        if minute is not None:
            value += (int(minute) * 10000000) // 60
        if second is not None:
            value += int(float(second) * 10000000) // 3600
        decimal = value / 10000000.0
        if direction in _DIRECTIONS_NEG:
            return -decimal
        return decimal
    except (ValueError, OverflowError):
        return None


def parse(s: str | None) -> float | None:
    """Parse a verbatim DMS coordinate to decimal degrees (or None)."""
    if s is None:
        return None
    normalised = s.lower().strip().replace("''", '"')
    for rx in (_VERBATIM, _VERBATIM_NO_DENOM):
        m = rx.match(normalised)
        if m:
            return convert_to_decimal(m.group(1), m.group(2), m.group(3), m.group(4))
    return None


def parse_with_direction(s: str | None) -> tuple[float | None, str | None]:
    """Returns (decimal, 'lat'|'lon') — LatOrLong.getDirection analog."""
    value = parse(s)
    if value is None:
        return None, None
    d = s.lower().strip()
    direction = re.search(r"(south|north|west|east|[snwe])\s*$", d)
    if not direction:
        return value, None
    tok = direction.group(1)
    if tok in _DIRECTIONS_LAT:
        return value, "lat"
    if tok in _DIRECTIONS_LON:
        return value, "lon"
    return value, None
