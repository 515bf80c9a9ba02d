"""Date parser table tests — 1:1 with reference DateFieldParserTests.cs:7-44."""

import pytest

from poc_document_ocr_spark.functions.datefold import parse_date


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("1985JAN12", "1985-01-12"),
        ("2026MAY03", "2026-05-03"),
        ("  2000DEC31  ", "2000-12-31"),
        ("1999feb05", "1999-02-05"),
    ],
)
def test_compact_form(raw, expected):
    assert parse_date(raw) == expected


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("3rd day of January, 2026", "2026-01-03"),
        ("1st DAY OF MARCH, 1990", "1990-03-01"),
        ("22ND DAY OF DECEMBER 2010", "2010-12-22"),
        (" 7  TH  DAY  OF  JULY ,  1976 ", "1976-07-07"),
    ],
)
def test_long_form(raw, expected):
    assert parse_date(raw) == expected


@pytest.mark.parametrize(
    "raw",
    [
        None,
        "",
        "   ",
        "not a date",
        "2026FEB30",                    # calendar invalid
        "31st DAY OF FEBRUARY, 2026",   # calendar invalid
        "2026XYZ12",                     # unknown month
        "2026-05-03",                    # ISO not supported
    ],
)
def test_invalid_inputs(raw):
    assert parse_date(raw) is None


def test_leap_year():
    assert parse_date("2024FEB29") == "2024-02-29"
    assert parse_date("2023FEB29") is None
    assert parse_date("1900FEB29") is None  # century non-leap
    assert parse_date("2000FEB29") == "2000-02-29"
