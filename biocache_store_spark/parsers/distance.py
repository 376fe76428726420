"""Distance / depth / elevation string parsing to metres.

Port of parser/DistanceRangeParser.scala:5-58. Handles:
    "2000", "100m", "1km-10km", "100m-1000m", ">10km", "<100m",
    "100-1000 m", "6ft", "3.5km", "100,000m"

Semantics preserved from the reference:
  * spaces and commas are stripped, input lower-cased;
  * a range takes the SECOND number's value/unit ("1km-10km" -> 10km);
  * greater/less-than markers are dropped (">10m" -> 10);
  * feet convert at 0.3048, km at 1000;
  * unitless values are metres.

Documented divergence: the reference's single-number-with-unit patterns
(DistanceRangeParser.scala:14-16) accept INTEGERS only, so "3.5km" parses
to None there; this engine accepts decimal+unit ("3.5km" -> 3500.0) — a
deliberate generalization, since decimal distances are common in real
uncertainty fields and the reference already accepts bare decimals.

Returns (metres, unit) where unit is "metres" | "kilometres" | "feet".
"""

from __future__ import annotations

import re

METRES = "metres"
KILOMETRES = "kilometres"
FEET = "feet"

_SINGLE_NUMBER = re.compile(r"^(-?[0-9]+)$")
_DECIMAL_NUMBER = re.compile(r"^(-?[0-9]+[.][0-9]+)$")
# the reference's unit character classes ([km|m|...]) are literal char sets;
# equivalent behavior: an optional unit token after the number
_UNIT = r"(m|metres|meters|km|kilometres|kilometers|ft|feet|f)"
_SINGLE_WITH_UNIT = re.compile(rf"^(-?[0-9]+(?:[.][0-9]+)?){_UNIT}$")
_RANGE = re.compile(rf"^(-?[0-9.]+){_UNIT}?-([0-9.]+){_UNIT}?$")
_GREATER_LESS = re.compile(rf"^([><])(-?[0-9.]+){_UNIT}?$")

_METRE_UNITS = {"m", "metres", "meters"}
_KM_UNITS = {"km", "kilometres", "kilometers"}
_FEET_UNITS = {"ft", "feet", "f"}


def _convert(value: str, unit: str | None) -> tuple[float, str] | None:
    try:
        v = float(value)
    except ValueError:
        return None
    if unit in _KM_UNITS:
        return v * 1000.0, KILOMETRES
    if unit in _FEET_UNITS:
        return round(v * 0.3048, 6), FEET
    return v, METRES


def parse(s: str | None) -> tuple[float, str] | None:
    """Parse to (metres, source_unit), or None."""
    if s is None:
        return None
    normalised = re.sub(r"[ ,]", "", s).lower().strip()
    if not normalised:
        return None
    m = _SINGLE_NUMBER.match(normalised) or _DECIMAL_NUMBER.match(normalised)
    if m:
        return float(m.group(1)), METRES
    m = _SINGLE_WITH_UNIT.match(normalised)
    if m:
        return _convert(m.group(1), m.group(2))
    m = _RANGE.match(normalised)
    if m:
        # reference takes the second (upper) bound — DistanceRangeParser.scala:38
        return _convert(m.group(3), m.group(4))
    m = _GREATER_LESS.match(normalised)
    if m:
        return _convert(m.group(2), m.group(3))
    return None


def parse_metres(s: str | None) -> float | None:
    result = parse(s)
    return result[0] if result else None
