"""EventProcessor — date assembly, validation, and precision truncation.

Port of processor/EventProcessor.scala:48-305 (process), :316-355
(runYearValidation), :357-384 (processFirstDates), :393-450
(processOtherDates), :479-650 (checkPrecision/reformatToPrecision).

A record function over a dict of raw string fields; chain.py wraps it in an
Arrow-batched Spark stage. Output processed fields mirror the reference's
string formatting quirks exactly (day unpadded when built from d/m/y parts,
month always 2-digit, parser-derived components keep their padding).
"""

from __future__ import annotations

import datetime as _dt

from biocache_store_spark.parsers.dates import parse_date
from biocache_store_spark.parsers.vocab import DATE_PRECISION
from biocache_store_spark.processors.assertions import (
    AssertionCodes as C,
)
from biocache_store_spark.processors.assertions import QualityAssertion as QA

_FIRST_FLEET = (1788, 1, 26)


def _java_parse_int(s) -> int | None:
    """Integer.parseInt semantics for the raw day/month/year fields:
    Python's int() additionally accepts underscore separators ('2_0' ->
    20) and non-ASCII digits, both of which java rejects — a dirty year
    like '2_0' must be an invalid date, not year 20."""
    t = str(s).strip()
    if not t or "_" in t or not t.isascii():
        return None
    try:
        v = int(t)
    except (ValueError, TypeError):
        return None
    # Integer.parseInt throws past the 32-bit range; without this an
    # overflowing day like '9999999999' would reach the day > 31 branch
    # and emit an assertion the reference never produces
    if not -(2**31) <= v <= 2**31 - 1:
        return None
    return v


def _validate_number(s, predicate):
    """validateNumber: (parsed value, predicate ok); (-1, False) on parse error."""
    if s is None or str(s).strip() == "":
        return -1, False
    v = _java_parse_int(s)
    if v is None:
        return -1, False
    return v, predicate(v)


def _is_int(s) -> bool:
    return s is not None and _java_parse_int(s) is not None


def run_year_validation(
    rawyear: int, current_year: int, day: int = 0, month: int = 0, today=None
):
    """EventProcessor.runYearValidation (EventProcessor.scala:316-355)."""
    valid_year = True
    comment = ""
    year = rawyear
    if year > 0:
        if year < 100:
            if year > current_year % 100:
                year += (current_year // 100 - 1) * 100
            else:
                year += (current_year // 100) * 100
                if day != 0 and month != 0:
                    try:
                        d = _dt.date(year, month, day)
                        if d > (today or _dt.date.today()):
                            year -= 100
                    except ValueError:
                        pass
        elif 100 <= year < 1600:
            year = -1
            valid_year = False
            comment = "Year out of range"
        elif year > current_year:
            year = -1
            valid_year = False
            comment = "Future year supplied"
        elif (year, month, day) == _FIRST_FLEET:
            valid_year = False
            comment = "First Fleet arrival implies a null date"
    return comment, valid_year, year


def process_event(raw: dict, today: _dt.date | None = None):
    """Returns (processed: dict, assertions: list[QualityAssertion]).

    raw keys used: day month year eventDate eventDateEnd verbatimEventDate
    datePrecision modified dateIdentified georeferencedDate
    """
    today = today or _dt.date.today()
    current_year = today.year
    assertions: list[QA] = []
    processed: dict = {}

    def blank(k):
        v = raw.get(k)
        return v is None or str(v).strip() == ""

    if all(
        blank(k)
        for k in ("day", "month", "year", "eventDate", "eventDateEnd", "verbatimEventDate")
    ):
        assertions.append(QA.failed(C.MISSING_COLLECTION_DATE, "No date information supplied"))

    date: _dt.date | None = None
    comment = ""
    add_passed_invalid = True
    date_complete = False

    year, valid_year = _validate_number(raw.get("year"), lambda y: 0 < y <= current_year)
    month, valid_month = _validate_number(raw.get("month"), lambda m: 1 <= m <= 12)
    day, valid_day = _validate_number(raw.get("day"), lambda d: 1 <= d <= 31)

    # transposed day/month check — EventProcessor.scala:78-92
    if not valid_month and _is_int(raw.get("month")) and _is_int(raw.get("day")):
        month_value = int(str(raw.get("month")).strip())
        day_value = int(str(raw.get("day")).strip())
        if month_value > 12 and day_value <= 12:
            month = day_value
            day = month_value
            assertions.append(QA.failed(C.DAY_MONTH_TRANSPOSED, "Assume day and month transposed"))
            valid_month = True
        else:
            assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, "Invalid month supplied"))
            add_passed_invalid = False
            assertions.append(QA.passed(C.DAY_MONTH_TRANSPOSED))

    if day == 0 or day > 31:
        assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, "Invalid day supplied"))
        add_passed_invalid = False

    if year > 0:
        comment, valid_year, year = run_year_validation(
            year, current_year, day if day > 0 else 0, month if month > 0 else 0, today
        )
        if comment:
            assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, comment))
            add_passed_invalid = False

    valid_dmy = valid_year and valid_day and valid_month
    if valid_dmy:
        try:
            date = _dt.date(year, month, day)
            date_complete = True
        except ValueError:
            valid_dmy = False
            comment = "Invalid year, day, month"
            assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, comment))
            add_passed_invalid = False
            date = None

    if valid_year:
        processed["year"] = str(year)
    if valid_month:
        processed["month"] = f"{month:02d}"
    if valid_day:
        processed["day"] = str(day)
    if date is not None:
        processed["eventDate"] = date.isoformat()

    # eventDate string fallback — EventProcessor.scala:146-201
    if date is None and not blank("eventDate"):
        parsed = parse_date(str(raw["eventDate"]), current_year)
        if parsed is not None:
            date = parsed.parsed_start_date
            processed["eventDate"] = parsed.start_date
            if parsed.end_date != parsed.start_date:
                processed["eventDateEnd"] = parsed.end_date
            processed["day"] = parsed.start_day
            processed["month"] = parsed.start_month
            if parsed.start_year != "":
                comment, valid_year, year = run_year_validation(
                    int(parsed.start_year),
                    current_year,
                    int(parsed.start_day) if parsed.start_day else 0,
                    int(parsed.start_month) if parsed.start_month else 0,
                    today,
                )
                if valid_year:
                    processed["year"] = str(year)
                    if processed.get("day") and processed.get("month"):
                        processed["eventDate"] = (
                            f"{processed['year']}-{processed['month']}-{processed['day']}"
                        )
                else:
                    processed["eventDate"] = None
                    processed["year"] = None
            if parsed.start_year and parsed.start_month and parsed.start_day:
                date_complete = True
            if parsed.parsed_start_date and parsed.parsed_start_date > today:
                assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, "Future date supplied"))
                add_passed_invalid = False

    # separately-supplied end date — EventProcessor.scala:204-211
    if not blank("eventDateEnd"):
        parsed = parse_date(str(raw["eventDateEnd"]), current_year)
        if parsed is not None:
            processed["eventDateEnd"] = parsed.start_date

    # verbatim fallback — EventProcessor.scala:214-267
    if date is None and not blank("verbatimEventDate"):
        parsed = parse_date(str(raw["verbatimEventDate"]), current_year)
        if parsed is not None:
            processed["eventDate"] = parsed.start_date
            if parsed.end_date != parsed.start_date:
                processed["eventDateEnd"] = parsed.end_date
            processed["day"] = parsed.start_day
            processed["month"] = parsed.start_month
            processed["year"] = parsed.start_year
            if parsed.start_year != "":
                comment, valid_year, year = run_year_validation(
                    int(parsed.start_year),
                    current_year,
                    int(parsed.start_day) if parsed.start_day else 0,
                    int(parsed.start_month) if parsed.start_month else 0,
                    today,
                )
                if valid_year:
                    processed["year"] = str(year)
                    if processed.get("day") and processed.get("month"):
                        processed["eventDate"] = (
                            f"{processed['year']}-{processed['month']}-{processed['day']}"
                        )
                else:
                    processed["eventDate"] = None
                    processed["year"] = None
            if parsed.start_year and parsed.start_month and parsed.start_day:
                date_complete = True
    elif not processed.get("eventDateEnd") and not blank("verbatimEventDate"):
        parsed = parse_date(str(raw["verbatimEventDate"]), current_year)
        if parsed is not None and parsed.end_date != parsed.start_date:
            processed["eventDateEnd"] = parsed.end_date

    # REFERENCE PARITY (EventProcessor.scala:108 + :272): when the year
    # validation rejects, INVALID_COLLECTION_DATE is appended with the
    # same comment BOTH in the mainline block above and here — the
    # reference emits the duplicate, so the assertion multiset keeps it
    if not valid_year and (not processed.get("eventDate") or comment != ""):
        assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, comment))
        add_passed_invalid = False

    # future-date check (tomorrow allowed) — EventProcessor.scala:276-279.
    # REFERENCE PARITY: `date` is only set by the d/m/y construction, so a
    # future date arriving via eventDate/verbatimEventDate strings is NOT
    # caught here — the reference's verbatim branch never assigns `date`
    # either, and mirrored tests pin the shared behavior
    if date is not None and date > today + _dt.timedelta(days=1):
        assertions.append(QA.failed(C.INVALID_COLLECTION_DATE, "Future date supplied"))
        add_passed_invalid = False

    if add_passed_invalid:
        assertions.append(QA.passed(C.INVALID_COLLECTION_DATE))

    if date_complete:
        assertions.append(QA.passed(C.INCOMPLETE_COLLECTION_DATE))
    else:
        assertions.append(
            QA.failed(C.INCOMPLETE_COLLECTION_DATE, "The supplied collection date is not complete")
        )

    _process_other_dates(raw, processed, assertions, current_year)
    _process_first_dates(processed, assertions)
    _check_precision(raw, processed, assertions, current_year)

    return processed, assertions


def _process_other_dates(raw, processed, assertions, current_year):
    """EventProcessor.processOtherDates (EventProcessor.scala:393-450)."""
    for src, dst in (("modified", "modified"), ("dateIdentified", "dateIdentified"),
                     ("georeferencedDate", "georeferencedDate")):
        v = raw.get(src)
        if v:
            parsed = parse_date(str(v), current_year)
            if parsed is not None:
                processed[dst] = parsed.start_date

    event_date = processed.get("eventDate")
    if event_date:
        ev = parse_date(event_date, current_year)
        if ev is not None and ev.parsed_start_date is not None:
            di = processed.get("dateIdentified")
            if di:
                parsed_di = parse_date(di, current_year)
                if parsed_di is not None and parsed_di.parsed_start_date is not None:
                    if parsed_di.parsed_start_date < ev.parsed_start_date:
                        assertions.append(
                            QA.failed(
                                C.ID_PRE_OCCURRENCE,
                                "The records was identified before it was collected",
                            )
                        )
                    else:
                        assertions.append(QA.passed(C.ID_PRE_OCCURRENCE))
            gd = processed.get("georeferencedDate")
            if gd:
                parsed_gd = parse_date(gd, current_year)
                if parsed_gd is not None and parsed_gd.parsed_start_date is not None:
                    if parsed_gd.parsed_start_date != ev.parsed_start_date:
                        assertions.append(
                            QA.failed(
                                C.GEOREFERENCE_POST_OCCURRENCE,
                                "The record was not georeferenced on the day it was collected",
                            )
                        )
                    else:
                        assertions.append(QA.passed(C.GEOREFERENCE_POST_OCCURRENCE))


def _process_first_dates(processed, assertions):
    """EventProcessor.processFirstDates (EventProcessor.scala:357-384)."""
    day = processed.get("day")
    month = processed.get("month")
    year = processed.get("year")
    if day in ("1", "01"):
        assertions.append(QA.failed(C.FIRST_OF_MONTH))
        if month in ("01", "1"):
            assertions.append(QA.failed(C.FIRST_OF_YEAR))
            if year is not None:
                y, ok = _validate_number(year, lambda v: v > 0)
                if ok and y % 100 == 0:
                    assertions.append(QA.failed(C.FIRST_OF_CENTURY))
                else:
                    assertions.append(QA.passed(C.FIRST_OF_CENTURY))
        elif month is not None:
            assertions.append(QA.passed(C.FIRST_OF_YEAR))
    elif day is not None:
        assertions.append(QA.passed(C.FIRST_OF_MONTH))


_DAY_P, _MONTH_P, _YEAR_P = "Day", "Month", "Year"
_DAY_RANGE_P, _MONTH_RANGE_P, _YEAR_RANGE_P = "Day Range", "Month Range", "Year Range"
_NOT_SUPPLIED_P = "Not Supplied"


def _format_component_date(ev, fmt: str) -> str:
    """DateFormatUtils.format(parsedStartDate, fmt) analog: rebuild from the
    EventDate's components (missing month/day default to 01, as the
    reference's parsed java.util.Date does)."""
    y = int(ev.start_year)
    m = int(ev.start_month) if ev.start_month else 1
    d = int(ev.start_day) if ev.start_day else 1
    if fmt == "yyyy":
        return f"{y:04d}"
    if fmt == "yyyy-MM":
        return f"{y:04d}-{m:02d}"
    return f"{y:04d}-{m:02d}-{d:02d}"


def _reformat_to_precision(
    processed, fmt: str, nullify_day: bool, nullify_month: bool, nullify_year: bool,
    current_year: int | None = None,
):
    """EventProcessor.reformatToPrecision (EventProcessor.scala:534-645):
    reformat single dates to the precision's format, force-nullify
    components, nullify components that differ across a range, then infer
    datePrecision when none was supplied."""
    from biocache_store_spark.parsers.dates import parse_date

    # current_year rides through: parse_date's validity gate would
    # otherwise fall back to the MACHINE clock, making datePrecision
    # depend on when the job runs rather than the pipeline's pinned today
    start = parse_date(processed.get("eventDate"), current_year)
    end = parse_date(processed.get("eventDateEnd"), current_year)
    if start is not None and start.single_date and start.start_year:
        processed["eventDate"] = _format_component_date(start, fmt)
    if end is not None and end.single_date and end.start_year:
        processed["eventDateEnd"] = _format_component_date(end, fmt)
    if nullify_day:
        processed["day"] = None
    if nullify_month:
        processed["month"] = None
    if nullify_year:
        processed["year"] = None
    # the reference's FullRecord leaves unset components null, never ""
    for k in ("day", "month", "year"):
        if processed.get(k) == "":
            processed[k] = None
    if start is not None and end is not None:
        # ranges — nullify what differs (EventProcessor.scala:573-588)
        if start.start_day and end.start_day and start.start_day != end.start_day:
            processed["day"] = None
        if (
            start.start_month
            and end.start_month
            and start.start_month != end.start_month
        ):
            processed["month"] = None
            processed["day"] = None
        if start.start_year and end.start_year and start.start_year != end.start_year:
            processed["year"] = None
            processed["month"] = None
            processed["day"] = None

    if processed.get("datePrecision"):
        return
    # determine a precision from the values (EventProcessor.scala:591-643,
    # including the quirky downgrade cascade, ported condition for condition)
    if start is not None and end is not None:
        determined = _DAY_RANGE_P
        if (
            start.start_day == end.start_day
            and start.start_day
            and start.start_month == end.start_month
            and start.start_month
            and start.start_year == end.start_year
            and start.start_year
        ):
            determined = _DAY_P
        if (
            (start.start_day != end.start_day or (not start.start_day and not end.start_day))
            and start.start_month == end.start_month
            and start.start_month
            and start.start_year == end.start_year
            and start.start_year
        ):
            determined = _MONTH_P
        elif not start.start_day and not end.start_day:
            determined = _MONTH_RANGE_P
        if (
            (start.start_day != end.start_day or (not start.start_day and not end.start_day))
            and (
                start.start_month != end.start_month
                or (not start.start_month and not end.start_month)
            )
            and start.start_year == end.start_year
            and start.start_year
        ):
            determined = _YEAR_P
        elif not start.start_month and not end.start_month:
            determined = _YEAR_RANGE_P
        processed["datePrecision"] = determined
    elif start is not None:
        determined = _DAY_P
        if not processed.get("day") and processed.get("month") and processed.get("year"):
            determined = _MONTH_P
        if (
            not processed.get("day")
            and not processed.get("month")
            and processed.get("year")
        ):
            determined = _YEAR_P
        processed["datePrecision"] = determined
    else:
        processed["datePrecision"] = _NOT_SUPPLIED_P


def _check_precision(raw, processed, assertions, current_year=None):
    """EventProcessor.checkPrecision (EventProcessor.scala:479-521): map the
    raw datePrecision through the vocabulary and reformat; with no (or an
    unmatched) precision, reformat at day precision — which also runs the
    range-nullify rules and infers datePrecision from the date shape."""
    raw_precision = raw.get("datePrecision")
    has_precision = raw_precision is not None and str(raw_precision).strip() != ""
    if has_precision and processed.get("eventDate"):
        term = DATE_PRECISION.match_term(str(raw_precision))
        if term is None:
            assertions.append(
                QA.failed(
                    C.DATE_PRECISION_MISMATCH,
                    f"Unrecognised date precision {raw_precision}",
                )
            )
            _reformat_to_precision(processed, "yyyy-MM-dd", False, False, False, current_year)
            return
        processed["datePrecision"] = term.canonical
        if term.canonical == _DAY_P:
            _reformat_to_precision(processed, "yyyy-MM-dd", False, False, False, current_year)
        elif term.canonical == _MONTH_P:
            _reformat_to_precision(processed, "yyyy-MM", True, False, False, current_year)
        elif term.canonical == _YEAR_P:
            _reformat_to_precision(processed, "yyyy", True, True, False, current_year)
        elif term.canonical == _DAY_RANGE_P:
            # yyyy-MM with the day KEPT is the reference's exact choice
            # (EventProcessor.scala:502-505) — internally odd for a
            # single-date record, but part of the parity contract
            _reformat_to_precision(processed, "yyyy-MM", False, False, False, current_year)
        elif term.canonical == _MONTH_RANGE_P:
            _reformat_to_precision(processed, "yyyy-MM", True, False, False, current_year)
        elif term.canonical == _YEAR_RANGE_P:
            _reformat_to_precision(processed, "yyyy", True, True, True, current_year)
        else:
            _reformat_to_precision(processed, "yyyy-MM-dd", False, False, False, current_year)
    else:
        _reformat_to_precision(processed, "yyyy-MM-dd", False, False, False, current_year)
