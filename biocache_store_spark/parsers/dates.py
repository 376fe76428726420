"""Fuzzy multi-format event-date parsing.

Port of the reference date parser semantics (parser/DateParser.scala:264-448,
extractors :452-1097): ISO single dates with optional time+offset, year and
year-month forms, month-name forms, six flavours of ranges (full-date,
day-only "2007-11-13/15", month-day "1998-09-30/10-07", month-year, month,
year with 2-digit end "1978/91"), verbose java-epoch strings, non-ISO
day-first forms, and 2-digit-year day-first forms with the reference's 1920
cutoff (DateParser.scala:147 newTwoDigitYearDateFormat).

An EventDate mirrors parser/DateParser.scala:448: all components are strings
("" when the source form doesn't carry them) plus the singleDate flag, whose
occasionally-surprising values (a bare year is single_date=False, a
year-month is True — DateParser.scala:521,650) are preserved because
EventProcessor.reformatToPrecision keys off them.

Range separators follow ParseUtil.splitRange (DateParser.scala:1088): "&"
first, then "to", else "/"; parts are trimmed and trailing "-" stripped.

Known deliberate divergences from the JVM implementation:
  * day-of-week names in verbose dates ("Fri Aug 12 ...") are not
    cross-validated against the date (java STRICT resolver does);
  * time-of-day digits are shape-checked, not range-checked.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import functools as _functools
import re
from dataclasses import dataclass, replace

TWO_DIGIT_YEAR_CUTOFF = 1920  # Config default, DateParser.scala:147
MIN_END_YEAR = 1600  # DateParser.isValid, DateParser.scala:398

# hard-coded English names, NOT calendar.month_abbr/month_name: those
# render via the process locale, so a non-English LC_TIME would silently
# break every month-name parse (the reference pins Locale.US,
# DateParser.scala:143)
_EN_ABBR = ("jan", "feb", "mar", "apr", "may", "jun",
            "jul", "aug", "sep", "oct", "nov", "dec")
_EN_FULL = ("january", "february", "march", "april", "may", "june",
            "july", "august", "september", "october", "november", "december")
_MONTHS_ABBR = {m: i + 1 for i, m in enumerate(_EN_ABBR)}
_MONTHS_FULL = {m: i + 1 for i, m in enumerate(_EN_FULL)}

# HH:mm[:ss[.frac]] with optional offset (+HH:MM | +HHMM | +HH | Z)
_TIME_RE = r"\d{1,2}:\d{2}(?::\d{2}(?:\.\d+)?)?"
_OFFSET_RE = r"(?:[Zz]|[+-]\d{2}(?::?\d{2})?)"
_OPT_TIME_OFFSET = rf"(?:[T ]{_TIME_RE}{_OFFSET_RE}?)?{_OFFSET_RE}?"


@dataclass(frozen=True)
class EventDate:
    start_date: str
    start_day: str
    start_month: str
    start_year: str
    end_date: str
    end_day: str
    end_month: str
    end_year: str
    single_date: bool

    @property
    def parsed_start_date(self) -> _dt.date | None:
        return _components_to_date(self.start_year, self.start_month, self.start_day)

    @property
    def parsed_end_date(self) -> _dt.date | None:
        return _components_to_date(self.end_year, self.end_month, self.end_day)


def _components_to_date(y: str, m: str, d: str) -> _dt.date | None:
    if not y:
        return None
    try:
        return _dt.date(int(y), int(m) if m else 1, int(d) if d else 1)
    except ValueError:
        return None


def _valid_date(y: int, m: int, d: int) -> bool:
    try:
        _dt.date(y, m, d)
        return True
    except ValueError:
        return False


def _reduced_year(two_digits: int, cutoff: int = TWO_DIGIT_YEAR_CUTOFF) -> int:
    """java appendValueReduced(YEAR, 2, 2, cutoff): map into [cutoff, cutoff+99]."""
    century = cutoff - cutoff % 100
    year = century + two_digits
    if year < cutoff:
        year += 100
    return year


def _single(date: _dt.date, *, single_date: bool = True) -> EventDate:
    iso = date.isoformat()
    return EventDate(
        start_date=iso,
        start_day=f"{date.day:02d}",
        start_month=f"{date.month:02d}",
        start_year=f"{date.year:04d}",
        end_date=iso,
        end_day=f"{date.day:02d}",
        end_month=f"{date.month:02d}",
        end_year=f"{date.year:04d}",
        single_date=single_date,
    )


def _split_range(s: str) -> list[str]:
    """ParseUtil.splitRange: '&' first, then 'to', else '/'; strip trailing '-'.

    (The 'to' split famously also fires inside 'October'; the extractor
    ordering makes this mostly harmless, and we keep the behavior.)
    """
    if "&" in s:
        parts = s.split("&")
    elif "to" in s:
        parts = s.split("to")
    else:
        parts = s.split("/")
    return [p.strip().rstrip("-") if p.strip().endswith("-") else p.strip() for p in parts]


# --- ISO-or-formats date-with-optional-time parsing (parseISOOrFormats) -----

_ISO_DATE_TIME_RE = re.compile(
    rf"^(\d{{4}})-(\d{{2}})-(\d{{2}})(?:{_OPT_TIME_OFFSET})$"
)
_SLASH_DATE_TIME_RE = re.compile(
    rf"^(\d{{4}})/(\d{{2}})/(\d{{2}})(?:{_OPT_TIME_OFFSET})$"
)


def _parse_iso_like(s: str) -> _dt.date | None:
    """ISO yyyy-MM-dd (or yyyy/MM/dd) with optional time and offset."""
    for rx in (_ISO_DATE_TIME_RE, _SLASH_DATE_TIME_RE):
        m = rx.match(s)
        if m:
            y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
            if _valid_date(y, mo, d):
                return _dt.date(y, mo, d)
            return None
    return None


# --- extractors, in parseISODate order (DateParser.scala:349-367) -----------


def _iso_single_year(s: str) -> EventDate | None:
    if re.fullmatch(r"\d{4}", s):
        y = s
        # singleDate=False for a bare year — DateParser.scala:521
        return EventDate(y, "", "", y, y, "", "", y, single_date=False)
    return None


_MONTH_DATE_FORMS = (
    re.compile(r"^(\d{4})-(\d{2})$"),  # uuuu-MM
    re.compile(r"^(\d{4})-(\d{2})-$"),  # uuuu-MM-
    re.compile(r"^(\d{4})-(\d{2})-00$"),  # uuuu-MM-00
)
_MONTH_SPACE_YEAR = re.compile(r"^(\d{2}) (\d{4})$")  # MM uuuu
_MONTHNAME_HYPHEN_YEAR = re.compile(r"^([A-Za-z]{3})-(\d{4})$")  # MMM-uuuu


def _iso_month_date(s: str) -> EventDate | None:
    y = mo = None
    for rx in _MONTH_DATE_FORMS:
        m = rx.match(s)
        if m:
            y, mo = int(m.group(1)), int(m.group(2))
            break
    if y is None:
        m = _MONTH_SPACE_YEAR.match(s)
        if m:
            mo, y = int(m.group(1)), int(m.group(2))
    if y is None:
        m = _MONTHNAME_HYPHEN_YEAR.match(s)
        if m and m.group(1).lower() in _MONTHS_ABBR:
            mo, y = _MONTHS_ABBR[m.group(1).lower()], int(m.group(2))
    if y is None or mo is None or not 1 <= mo <= 12:
        return None
    ym = f"{y:04d}-{mo:02d}"
    mm = f"{mo:02d}"
    yy = f"{y:04d}"
    # day stays "", start/end date keep the uuuu-MM form; singleDate=True is
    # required by reformatToPrecision — DateParser.scala:649-651
    return EventDate(ym, "", mm, yy, ym, "", mm, yy, single_date=True)


def _iso_single_date(s: str) -> EventDate | None:
    d = _parse_iso_like(s)
    return _single(d) if d else None


_MONTH_NAME_DATE = re.compile(
    rf"^(\d{{4}})-([A-Za-z]{{3,}})-(\d{{2}})(?:{_OPT_TIME_OFFSET})$"
)


def _iso_month_name_date(s: str) -> EventDate | None:
    m = _MONTH_NAME_DATE.match(s)
    if not m:
        return None
    name = m.group(2).lower()
    mo = _MONTHS_FULL.get(name) or _MONTHS_ABBR.get(name)
    if not mo:
        return None
    y, d = int(m.group(1)), int(m.group(3))
    if not _valid_date(y, mo, d):
        return None
    return _single(_dt.date(y, mo, d))


_LOOSE_ISO_DATE = re.compile(rf"^(\d{{4}})-(\d{{1,2}})-(\d{{1,2}})(?:{_OPT_TIME_OFFSET})$")


def _parse_range_part_full(s: str) -> _dt.date | None:
    """DateRange part: ISO-like, incl. uuuu-M-d and space-separated times."""
    d = _parse_iso_like(s)
    if d:
        return d
    m = _LOOSE_ISO_DATE.match(s)
    if m:
        y, mo, dd = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if _valid_date(y, mo, dd):
            return _dt.date(y, mo, dd)
    return None


def _range_event(start: _dt.date, end: _dt.date) -> EventDate:
    return EventDate(
        start_date=start.isoformat(),
        start_day=f"{start.day:02d}",
        start_month=f"{start.month:02d}",
        start_year=f"{start.year:04d}",
        end_date=end.isoformat(),
        end_day=f"{end.day:02d}",
        end_month=f"{end.month:02d}",
        end_year=f"{end.year:04d}",
        single_date=start == end,
    )


def _iso_date_range(s: str) -> EventDate | None:
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    start = _parse_range_part_full(parts[0])
    end = _parse_range_part_full(parts[1])
    if start and end:
        return _range_event(start, end)
    return None


def _iso_day_date_range(s: str) -> EventDate | None:
    """uuuu-MM-dd/dd"""
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    start = _parse_range_part_full(parts[0])
    if not start or not re.fullmatch(r"\d{2}", parts[1]):
        return None
    day = int(parts[1])
    if not _valid_date(start.year, start.month, day):
        return None
    return _range_event(start, _dt.date(start.year, start.month, day))


def _iso_day_month_range(s: str) -> EventDate | None:
    """uuuu-MM-dd/MM-dd (end month-day, start's year)"""
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    start = _parse_range_part_full(parts[0])
    m = re.fullmatch(r"(\d{1,2})-(\d{1,2})", parts[1])
    if not start or not m:
        return None
    mo, day = int(m.group(1)), int(m.group(2))
    if not _valid_date(start.year, mo, day):
        return None
    return _range_event(start, _dt.date(start.year, mo, day))


def _safe_date(y: int, m: int, d: int) -> "_dt.date | None":
    """datetime.date cannot represent year 0 (Python's range starts at 1,
    while the JVM's proleptic ISO chronology parses '0000'); zero-filled
    years are common dirty data, so out-of-range components mean
    unparseable, not a crash."""
    try:
        return _dt.date(y, m, d)
    except ValueError:
        return None


def _iso_month_year_date_range(s: str) -> EventDate | None:
    """uuuu-MM/uuuu-MM"""
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    ms = re.fullmatch(r"(\d{4})-(\d{2})", parts[0])
    me = re.fullmatch(r"(\d{4})-(\d{2})", parts[1])
    if not ms or not me:
        return None
    sy, sm = int(ms.group(1)), int(ms.group(2))
    ey, em = int(me.group(1)), int(me.group(2))
    if not (1 <= sm <= 12 and 1 <= em <= 12):
        return None
    start, end = _safe_date(sy, sm, 1), _safe_date(ey, em, 1)
    if start is None or end is None:
        return None
    ev = _range_event(start, end)
    # reference compares String to Option => always false — DateParser.scala:742
    return replace(ev, single_date=False)


def _iso_month_date_range(s: str) -> EventDate | None:
    """uuuu-MM/MM (end month in start's year)"""
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    ms = re.fullmatch(r"(\d{4})-(\d{2})", parts[0])
    me = re.fullmatch(r"(\d{2})", parts[1])
    if not ms or not me:
        return None
    sy, sm = int(ms.group(1)), int(ms.group(2))
    em = int(me.group(1))
    if not (1 <= sm <= 12 and 1 <= em <= 12):
        return None
    start, end = _safe_date(sy, sm, 1), _safe_date(sy, em, 1)
    if start is None or end is None:
        return None
    ev = _range_event(start, end)
    return replace(ev, single_date=False)


def _iso_year_range(s: str) -> EventDate | None:
    """uuuu/uuuu and uuuu/uu (2-digit end year, 1920 cutoff)"""
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    if not re.fullmatch(r"\d{4}", parts[0]):
        return None
    sy = int(parts[0])
    if re.fullmatch(r"\d{4}", parts[1]):
        ey = int(parts[1])
    elif re.fullmatch(r"\d{2}", parts[1]):
        ey = _reduced_year(int(parts[1]))
    else:
        return None
    start, end = _safe_date(sy, 1, 1), _safe_date(ey, 1, 1)
    if start is None or end is None:
        return None
    return _range_event(start, end)


# NOTE: time-bearing ranges are handled by _iso_date_range itself
# (_parse_range_part_full strips time components); the separate
# _iso_date_time_range duplicate was removed as unreachable.


_VERBOSE = re.compile(
    r"^[A-Za-z]{3} ([A-Za-z]{3}) (\d{2}) \d{2}:\d{2}:\d{2} [A-Za-z]{1,5} (\d{4})$"
)


def _parse_verbose(s: str) -> _dt.date | None:
    """'Fri Aug 12 15:19:20 EST 2011' (day-of-week not cross-validated)."""
    m = _VERBOSE.match(s)
    if not m:
        return None
    mo = _MONTHS_ABBR.get(m.group(1).lower())
    if not mo:
        return None
    y, d = int(m.group(3)), int(m.group(2))
    if not _valid_date(y, mo, d):
        return None
    return _dt.date(y, mo, d)


def _iso_verbose_date_time_range(s: str) -> EventDate | None:
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    start = _parse_verbose(parts[0])
    end = _parse_verbose(parts[1])
    if start and end:
        return _range_event(start, end)
    return None


def _iso_verbose_date_time(s: str) -> EventDate | None:
    d = _parse_verbose(s)
    return _single(d) if d else None


_ISO_EXTRACTORS = (
    _iso_single_year,
    _iso_month_date,
    _iso_single_date,
    _iso_month_name_date,
    _iso_date_range,
    _iso_day_date_range,
    _iso_day_month_range,
    _iso_month_year_date_range,
    _iso_month_date_range,
    _iso_year_range,
    _iso_verbose_date_time_range,
    _iso_verbose_date_time,
)


# --- non-ISO (day-first) ----------------------------------------------------

_NONISO_NUMERIC = re.compile(rf"^(\d{{2}})[-/](\d{{2}})[-/](\d{{4}})(?:{_OPT_TIME_OFFSET})$")
# 1-2 digit day for the MONTH-NAME form only, matching the mirrored
# reference test matrix; the purely numeric form stays 2-digit-strict
# like the reference's STRICT DateTimeFormatter ("dd" rejects "1")
_NONISO_MONTHNAME = re.compile(
    rf"^(\d{{1,2}})[-/ ]([A-Za-z]{{3}})[-/ ](\d{{4}})(?:{_OPT_TIME_OFFSET})$"
)


def _parse_non_iso_single(s: str) -> _dt.date | None:
    d = _parse_iso_like(s)  # parseISOOrFormats tries ISO first
    if d:
        return d
    m = _NONISO_NUMERIC.match(s)
    if m:
        day, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if _valid_date(y, mo, day):
            return _dt.date(y, mo, day)
        return None
    m = _NONISO_MONTHNAME.match(s)
    if m and m.group(2).lower() in _MONTHS_ABBR:
        day, mo, y = int(m.group(1)), _MONTHS_ABBR[m.group(2).lower()], int(m.group(3))
        if _valid_date(y, mo, day):
            return _dt.date(y, mo, day)
    return None


def _non_iso_single_date(s: str) -> EventDate | None:
    d = _parse_non_iso_single(s)
    return _single(d) if d else None


def _non_iso_date_range(s: str) -> EventDate | None:
    parts = _split_range(s)
    if len(parts) != 2:
        return None
    start = _parse_non_iso_single(parts[0])
    end = _parse_non_iso_single(parts[1])
    if start and end:
        return _range_event(start, end)
    return None


_NONISO_2DIGIT_YEAR = re.compile(rf"^(\d{{2}})[-/](\d{{2}})[-/](\d{{2}})(?:{_OPT_TIME_OFFSET})$")


def _non_iso_truncated_year_date(s: str) -> EventDate | None:
    d = _parse_iso_like(s)
    if d:
        return _single(d)
    m = _NONISO_2DIGIT_YEAR.match(s)
    if not m:
        return None
    day, mo, y2 = int(m.group(1)), int(m.group(2)), int(m.group(3))
    y = _reduced_year(y2)
    if not _valid_date(y, mo, day):
        return None
    return _single(_dt.date(y, mo, day))


# --- top-level --------------------------------------------------------------


def _is_valid(ev: EventDate, current_year: int | None = None) -> bool:
    """DateParser.isValid (DateParser.scala:386-413)."""
    if current_year is None:
        current_year = _dt.date.today().year
    try:
        if ev.start_year and int(ev.start_year) > current_year:
            return False
        if ev.end_year and int(ev.end_year) < MIN_END_YEAR:
            return False
        if ev.start_year and ev.end_year and int(ev.start_year) > int(ev.end_year):
            return False
        return True
    except ValueError:
        return False


def parse_iso_date(s: str) -> EventDate | None:
    for extractor in _ISO_EXTRACTORS:
        ev = extractor(s)
        if ev is not None:
            return ev
    return None


def parse_non_iso_date(s: str) -> EventDate | None:
    return _non_iso_single_date(s) or _non_iso_date_range(s)


@_functools.lru_cache(maxsize=65536)
def parse_date(s: str | None, current_year: int | None = None) -> EventDate | None:
    """DateParser.parseDate: ISO chain, validity-gated non-ISO fallbacks.

    Memoized (EventDate is frozen): archive date strings are massively
    repetitive, and the reference fronts parsing with LRU caches too.

    Non-ASCII input is unparseable by contract: every reference format
    is an ASCII DateTimeFormatter pattern under Locale.US, and java
    parses digits via the DecimalStyle '0' zero — Python regexes would
    otherwise accept unicode digits ('\\d' matches '٢٠٠٠') and unicode
    whitespace the reference's trim() never removes, silently parsing
    strings the reference rejects."""
    if s is None:
        return None
    if not s.isascii():
        return None
    s = s.strip()
    if s.startswith("/") or s.startswith("-"):
        s = s[1:]
    if not s:
        return None
    ev = parse_iso_date(s)
    if ev is not None and _is_valid(ev, current_year):
        return ev
    second = parse_non_iso_date(s)
    if second is not None and _is_valid(second, current_year):
        return second
    third = _non_iso_truncated_year_date(s)
    if third is not None and _is_valid(third, current_year):
        return third
    return None


def parse_string_to_datetime(s: str | None) -> _dt.datetime | None:
    """DateParser.parseStringToDate: ISO-ish string -> naive UTC datetime."""
    if not s:
        return None
    s = s.strip()
    if re.fullmatch(r"\d{4}", s):
        # year 0 is out of datetime's range: dirty zero-filled years must
        # be unparseable, not a crash (the full-date path already is)
        return _dt.datetime(int(s), 1, 1) if int(s) >= 1 else None
    m = re.fullmatch(r"(\d{4})-(\d{2})", s)
    if m:
        mo = int(m.group(2))
        if 1 <= mo <= 12 and int(m.group(1)) >= 1:
            return _dt.datetime(int(m.group(1)), mo, 1)
        return None
    m = re.fullmatch(
        rf"(\d{{4}})-(\d{{2}})-(\d{{2}})(?:[T ]({_TIME_RE}))?({_OFFSET_RE})?", s
    )
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not _valid_date(y, mo, d):
        return None
    hh = mm = ss = 0
    frac = 0
    if m.group(4):
        t = m.group(4)
        tm = re.fullmatch(r"(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?", t)
        if not tm:
            return None
        hh, mm = int(tm.group(1)), int(tm.group(2))
        ss = int(tm.group(3) or 0)
        frac = int((tm.group(4) or "0").ljust(6, "0")[:6])
    base = _dt.datetime(y, mo, d, hh, mm, ss, frac)
    off = m.group(5)
    if off and off not in ("Z", "z"):
        om = re.fullmatch(r"([+-])(\d{2}):?(\d{2})?", off)
        if om:
            delta = _dt.timedelta(hours=int(om.group(2)), minutes=int(om.group(3) or 0))
            base = base - delta if om.group(1) == "+" else base + delta
    return base
