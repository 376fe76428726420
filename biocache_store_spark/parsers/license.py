"""Licence string canonicalization (vocab/License.scala + license.txt).

The reference ships a 97-row ordered regex table; the FIRST regex that
finds a match anywhere in the (case-insensitively compared) input wins
(Vocab.matchRegex, vocab/Vocab.scala:75-80 — Pattern.asPredicate, i.e.
substring search, not full match). The table itself is a cross product —
CC clause combos x versions x jurisdiction, in two spelling families
("cc/creativecommons ... by" codes and "attribution ..." long form) — so
rather than inlining 97 strings this module GENERATES the table in the
reference's exact order, including its quirks:

  * version 1.0 names the ND+NC combo "CC-BY-ND-NC" (swapped order);
  * every 4.0 regex makes the version optional ("(4\\.0)?") so an
    unversioned licence string maps to the 4.0 canonical;
  * the first NC row of each Au long-form block uses a single "." where
    the later duplicate NC row uses ".*" (faithfully reproduced — with
    substring search the later duplicate catches what the quirk misses);
  * the long-form Au 3.0 rules appear twice, once version-before-au and
    once au-before-version;
  * "Custom" (.*) is the catch-all, so any non-empty unrecognized string
    canonicalizes to Custom.

A structural test asserts the generated table is row-for-row identical to
the reference file's (canonical, regex) sequence.
"""

from __future__ import annotations

import re

_CC_PREFIX = r".*(cc|creativecommons).*by"
_ATTR = r".*attribution"
_NC = r"(nc|non[ \-]?commercial)"
_ND = r"(nd|no[ \-]?deriv)"
_SA = r"(sa|share[ \-]?alike)"

_VERSIONS = ("3.0", "2.5", "2.0", "1.0")


def _esc(ver: str) -> str:
    return ver.replace(".", r"\.")


def _cc_rows(jur: str) -> list[tuple[str, str]]:
    """Short-form ("cc ... by ... nc ... sa ...") block for one jurisdiction."""
    tail = r".*au.*" if jur == "Au" else r".*(int)?.*"

    def row(label: str, parts: list[str], ver: str, opt: bool = False):
        ver_re = rf".*({_esc(ver)})?" if opt else rf".*{_esc(ver)}"
        body = _CC_PREFIX + "".join(f".*{p}" for p in parts) + ver_re + tail
        name = "CC-BY" + (f"-{label}" if label else "") + f" {ver} ({jur})"
        return (name, body)

    rows = []
    for ver in _VERSIONS:
        rows.append(row("NC-SA", ["nc", "sa"], ver))
        if ver == "1.0":
            rows.append(row("ND-NC", ["nd", "nc"], ver))
        else:
            rows.append(row("NC-ND", ["nc", "nd"], ver))
    rows.append(row("NC-SA", ["nc", "sa"], "4.0", opt=True))
    rows.append(row("NC-ND", ["nc", "nd"], "4.0", opt=True))
    for ver in _VERSIONS:
        for label, part in (("SA", "sa"), ("NC", "nc"), ("ND", "nd")):
            rows.append(row(label, [part], ver))
    for label, part in (("SA", "sa"), ("NC", "nc"), ("ND", "nd")):
        rows.append(row(label, [part], "4.0", opt=True))
    for ver in _VERSIONS:
        rows.append(row("", [], ver))
    rows.append(row("", [], "4.0", opt=True))
    return rows


def _attr_rows(jur: str, ver: str, tail: str, quirk_mid: str | None) -> list[tuple[str, str]]:
    """Long-form ("attribution ...") block: the fixed 8-row template
    NC-SA, NC-ND, NC(quirk), ND, SA, NC, ND, BY. `tail` carries the
    version+jurisdiction suffix; `quirk_mid` is the single-dot variant
    used by the first NC row (None = plain tail, Int block)."""

    def name(label: str) -> str:
        return "CC-BY" + (f"-{label}" if label else "") + f" {ver} ({jur})"

    rows = [
        (name("NC-SA"), rf"{_ATTR}.*{_NC}.*{_SA}{tail}"),
        (name("NC-ND"), rf"{_ATTR}.*{_NC}.*{_ND}{tail}"),
        (name("NC"), rf"{_ATTR}.*{_NC}{quirk_mid if quirk_mid is not None else tail}"),
        (name("ND"), rf"{_ATTR}.*{_ND}{tail}"),
        (name("SA"), rf"{_ATTR}.*{_SA}{tail}"),
        (name("NC"), rf"{_ATTR}.*{_NC}{tail}"),
        (name("ND"), rf"{_ATTR}.*{_ND}{tail}"),
        (name(""), rf"{_ATTR}{tail}"),
    ]
    return rows


def _build() -> list[tuple[str, str]]:
    rows: list[tuple[str, str]] = []
    rows += _cc_rows("Au")
    rows += _cc_rows("Int")
    rows += _attr_rows("Au", "3.0", r".*3\.0.*au.*", r".3\.0.*au.*")
    rows += _attr_rows("Au", "3.0", r".*au.*3\.0.*", r".au.*3\.0.*")
    rows += _attr_rows("Au", "4.0", r".*(4\.0)?.*au.*", r".(4\.0)?.*au.*")
    rows += _attr_rows("Int", "4.0", r".*", None)
    rows += [
        ("CC0", r".*(cc|creativecommons).*zero.*"),
        ("CC0", r".*(cc|creativecommons)(-)?0.*"),
        ("PDM", r".*pdm.*"),
        ("PDM", r".*public.*domain.*mark.*"),
        ("Custom", r".*"),
    ]
    return rows


LICENSE_TABLE: tuple[tuple[str, str], ...] = tuple(_build())

_COMPILED: tuple[tuple[str, re.Pattern], ...] = tuple(
    (name, re.compile(rx, re.IGNORECASE)) for name, rx in LICENSE_TABLE
)

_cache: dict[str, str | None] = {}


def match_license(value: str | None) -> str | None:
    """First-match-wins canonical licence, or None for null input.

    Non-empty unmatched strings land on the Custom catch-all, mirroring
    License.matchRegexCached (AttributionProcessor.scala:70-76)."""
    if value is None:
        return None
    hit = _cache.get(value)
    if hit is not None or value in _cache:
        return hit
    out = None
    for name, pat in _COMPILED:
        if pat.search(value):
            out = name
            break
    if len(_cache) < 10_000:
        _cache[value] = out
    return out
