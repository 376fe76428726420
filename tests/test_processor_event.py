"""EventProcessor tests — mirror ProcessEventTest.scala expectations."""

from __future__ import annotations

import datetime as dt

from biocache_store_spark.processors.assertions import FAILED, PASSED
from biocache_store_spark.processors.assertions import AssertionCodes as C
from biocache_store_spark.processors.event import process_event

TODAY = dt.date(2026, 8, 13)


def qa_status(assertions, code):
    found = [a for a in assertions if a.code == code]
    return found[-1].qa_status if found else None


def test_event_date_sets_components():
    p, a = process_event({"eventDate": "1978-12-31"}, TODAY)
    assert p["eventDate"] == "1978-12-31"
    assert p["day"] == "31"
    assert p["month"] == "12"
    assert p["year"] == "1978"
    assert p.get("eventDateEnd") is None


def test_event_datetime_millis():
    p, a = process_event({"eventDate": "2013-11-06T19:59:14.961"}, TODAY)
    assert p["eventDate"] == "2013-11-06"
    assert p["day"] == "06"
    assert p["month"] == "11"
    assert p["year"] == "2013"


def test_event_datetime_offset():
    p, a = process_event({"eventDate": "2018-09-19T08:50+1000"}, TODAY)
    assert p["eventDate"] == "2018-09-19"
    assert p["day"] == "19"
    assert p["month"] == "09"
    assert p["year"] == "2018"


def test_verbatim_date_range():
    p, a = process_event({"verbatimEventDate": "1978-12-31/1978-12-31"}, TODAY)
    assert p["eventDate"] == "1978-12-31"
    assert p["day"] == "31"
    assert p["month"] == "12"
    assert p["year"] == "1978"
    assert p.get("eventDateEnd") is None


def test_year_month_day_supplied():
    p, a = process_event({"year": "1978", "month": "12", "day": "31"}, TODAY)
    assert p["eventDate"] == "1978-12-31"
    assert p["day"] == "31"
    assert p["month"] == "12"
    assert p["year"] == "1978"


def test_two_digit_year():
    p, a = process_event({"year": "78", "month": "12", "day": "31"}, TODAY)
    assert p["eventDate"] == "1978-12-31"
    assert p["year"] == "1978"


def test_day_month_transposed():
    p, a = process_event({"year": "78", "month": "16", "day": "6"}, TODAY)
    assert p["eventDate"] == "1978-06-16"
    assert p["day"] == "16"
    assert p["month"] == "06"
    assert p["year"] == "1978"
    assert qa_status(a, C.DAY_MONTH_TRANSPOSED.code) == FAILED


def test_invalid_month():
    p, a = process_event({"year": "78", "month": "16", "day": "16"}, TODAY)
    assert p.get("eventDate") is None
    assert p["day"] == "16"
    assert p.get("month") is None
    assert p["year"] == "1978"
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == FAILED


def test_invalid_month_over_12():
    p, a = process_event({"year": "1978", "month": "40", "day": "16"}, TODAY)
    assert p.get("eventDate") is None
    assert p.get("month") is None
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == FAILED


def test_year_11_this_century():
    p, a = process_event({"year": "11", "month": "02", "day": "01"}, TODAY)
    assert p["eventDate"] == "2011-02-01"
    assert p["day"] == "1"  # unpadded: reference uses day.toString
    assert p["month"] == "02"
    assert p["year"] == "2011"
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == PASSED


def test_plain_date():
    p, a = process_event({"eventDate": "1973-10-14"}, TODAY)
    assert p["eventDate"] == "1973-10-14"
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == PASSED


def test_today_is_valid():
    p, a = process_event({"eventDate": TODAY.isoformat()}, TODAY)
    assert p["year"] == str(TODAY.year)
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == PASSED


def test_future_date():
    future = (TODAY + dt.timedelta(days=2)).isoformat()
    p, a = process_event({"eventDate": future}, TODAY)
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == FAILED


def test_first_of_month_year_century():
    p, a = process_event({"day": "1", "month": "1", "year": "2000"}, TODAY)
    assert qa_status(a, C.FIRST_OF_MONTH.code) == FAILED
    assert qa_status(a, C.FIRST_OF_YEAR.code) == FAILED
    assert qa_status(a, C.FIRST_OF_CENTURY.code) == FAILED


def test_first_of_month_year():
    p, a = process_event({"day": "1", "month": "1", "year": "2001"}, TODAY)
    assert qa_status(a, C.FIRST_OF_MONTH.code) == FAILED
    assert qa_status(a, C.FIRST_OF_YEAR.code) == FAILED
    assert qa_status(a, C.FIRST_OF_CENTURY.code) == PASSED


def test_first_of_month_only():
    p, a = process_event({"day": "1", "month": "2", "year": "2001"}, TODAY)
    assert qa_status(a, C.FIRST_OF_MONTH.code) == FAILED
    assert qa_status(a, C.FIRST_OF_YEAR.code) == PASSED
    assert qa_status(a, C.FIRST_OF_CENTURY.code) is None


def test_not_first():
    p, a = process_event({"day": "2", "month": "2", "year": "2001"}, TODAY)
    assert qa_status(a, C.FIRST_OF_MONTH.code) == PASSED
    assert qa_status(a, C.FIRST_OF_YEAR.code) is None


def test_year_only_incomplete_not_invalid():
    p, a = process_event({"eventDate": "1978"}, TODAY)
    assert qa_status(a, C.INCOMPLETE_COLLECTION_DATE.code) == FAILED
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == PASSED


def test_year_only_field():
    p, a = process_event({"year": "2014"}, TODAY)
    assert qa_status(a, C.INCOMPLETE_COLLECTION_DATE.code) == FAILED
    assert qa_status(a, C.INVALID_COLLECTION_DATE.code) == PASSED


def test_missing_date():
    p, a = process_event({}, TODAY)
    assert qa_status(a, C.MISSING_COLLECTION_DATE.code) == FAILED


def test_id_pre_occurrence():
    p, a = process_event(
        {"eventDate": "2000-05-05", "dateIdentified": "1999-01-01"}, TODAY
    )
    assert qa_status(a, C.ID_PRE_OCCURRENCE.code) == FAILED
    p, a = process_event(
        {"eventDate": "2000-05-05", "dateIdentified": "2001-01-01"}, TODAY
    )
    assert qa_status(a, C.ID_PRE_OCCURRENCE.code) == PASSED


def test_georeference_date_check():
    p, a = process_event(
        {"eventDate": "2000-05-05", "georeferencedDate": "2000-05-06"}, TODAY
    )
    assert qa_status(a, C.GEOREFERENCE_POST_OCCURRENCE.code) == FAILED
    p, a = process_event(
        {"eventDate": "2000-05-05", "georeferencedDate": "2000-05-05"}, TODAY
    )
    assert qa_status(a, C.GEOREFERENCE_POST_OCCURRENCE.code) == PASSED


def test_date_precision_month():
    p, a = process_event(
        {"eventDate": "2000-05-05", "datePrecision": "month"}, TODAY
    )
    assert p["eventDate"] == "2000-05"
    assert p.get("day") is None
    assert p["datePrecision"] == "Month"


def test_date_precision_year():
    p, a = process_event(
        {"eventDate": "2000-05-05", "datePrecision": "Y"}, TODAY
    )
    assert p["eventDate"] == "2000"
    assert p.get("month") is None
    assert p["datePrecision"] == "Year"


# --- DatePrecisionTest.scala matrix (checkPrecision/reformatToPrecision) ---

import pytest as _pytest

_PRECISION_CASES = [
    # explicit precision: (raw datePrecision, eventDate) -> processed eventDate
    ("", "2000-01-01", {"eventDate": "2000-01-01"}),
    ("D", "2000-01-01", {"eventDate": "2000-01-01"}),
    ("d", "2000-01-01", {"eventDate": "2000-01-01"}),
    ("day", "2000-01-01", {"eventDate": "2000-01-01"}),
    ("Day", "2000-01-01", {"eventDate": "2000-01-01"}),
    ("O", "2000-01-01", {"eventDate": "2000-01"}),
    ("Month", "2000-01-01", {"eventDate": "2000-01"}),
    ("M", "2000-01-01", {"eventDate": "2000-01"}),
    ("Y", "2000-01-01", {"eventDate": "2000"}),
    ("y", "2000-01-01", {"eventDate": "2000"}),
    ("year", "2000-01-01", {"eventDate": "2000"}),
    ("YEAR", "2000-01-01", {"eventDate": "2000"}),
]


@_pytest.mark.parametrize("precision,event_date,want", _PRECISION_CASES)
def test_precision_matrix_explicit(precision, event_date, want):
    raw = {"eventDate": event_date}
    if precision:
        raw["datePrecision"] = precision
    p, _ = process_event(raw, TODAY)
    for k, v in want.items():
        assert p.get(k) == v, (precision, event_date, k, p.get(k))


_DETERMINED_CASES = [
    # (eventDate, eventDateEnd, rawPrecision, expected processed fields)
    ("2000-01-01", "2003-01-01", "YY",
     {"year": None, "month": None, "day": None, "datePrecision": "Year Range"}),
    ("2010-01-01", "2010-12-31", None,
     {"year": "2010", "month": None, "day": None, "datePrecision": "Year"}),
    ("2000", "2001", None, {"year": None, "datePrecision": "Year Range"}),
    ("2000-01", "2001-02", None,
     {"year": None, "month": None, "day": None, "datePrecision": "Month Range"}),
    ("2000-01-01", "", None,
     {"datePrecision": "Day", "year": "2000", "month": "01", "day": "01"}),
    ("2000-01-01", "2000-01-01", None,
     {"datePrecision": "Day", "year": "2000", "month": "01", "day": "01"}),
    ("2000-01", "", None,
     {"datePrecision": "Month", "year": "2000", "month": "01", "day": None}),
    ("2000-01", "2000-01", None,
     {"datePrecision": "Month", "year": "2000", "month": "01", "day": None}),
    ("2000", "", None,
     {"datePrecision": "Year", "year": "2000", "month": None, "day": None}),
    ("2000", "2000", None,
     {"datePrecision": "Year", "year": "2000", "month": None, "day": None}),
]


@_pytest.mark.parametrize("start,end,precision,want", _DETERMINED_CASES)
def test_precision_matrix_determined(start, end, precision, want):
    raw = {"eventDate": start, "eventDateEnd": end}
    if precision:
        raw["datePrecision"] = precision
    p, _ = process_event(raw, TODAY)
    for k, v in want.items():
        assert p.get(k) == v, (start, end, precision, k, p.get(k))


def test_java_integer_parse_semantics():
    """Integer.parseInt parity: Python's int() leniencies (underscore
    separators, non-ASCII digits) must NOT make dirty day/month/year
    fields valid — '2_0' is an invalid year, not year 20."""
    from biocache_store_spark.processors.event import process_event

    processed, assertions = process_event(
        {"year": "2_0", "month": "0_1", "day": "1_0"}
    )
    assert "year" not in processed and "eventDate" not in processed
    processed, _ = process_event({"year": "٢٠٠٠", "month": "01", "day": "05"})
    assert "year" not in processed
    # Integer.parseInt throws past 32 bits: an overflowing day must be a
    # PARSE error ((-1, False) -> no day>31 assertion), not day=9999999999
    processed, assertions = process_event(
        {"year": "2000", "month": "01", "day": "9999999999"}
    )
    assert "day" not in processed
    assert not any(
        a.comment == "Invalid day supplied" for a in assertions
    )


def test_parse_date_rejects_non_ascii():
    """Every reference date format is an ASCII Locale.US pattern; unicode
    digits/whitespace must be unparseable, not silently accepted by
    Python's unicode-aware regexes."""
    from biocache_store_spark.parsers.dates import parse_date

    assert parse_date("٢٠٠٠-٠١-٠٥") is None
    assert parse_date("2000-01-05\u00a0") is None  # NBSP: java trim() keeps it
    ev = parse_date("2000-01-05")
    assert ev is not None and ev.start_date == "2000-01-05"
