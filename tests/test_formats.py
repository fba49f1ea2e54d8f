"""format keyword: annotate-only by default, asserted when enabled
(reference jschon/vocabulary/format.py:14-32; enablement
jschon/catalog/__init__.py:267-279; plug-in validators format.py:47-66)."""

import pytest

from jschon_spark.testing import check_case

CASES = [
    ("json-pointer", "/a/b~0c", True),
    ("json-pointer", "bad", False),
    ("relative-json-pointer", "1/foo", True),
    ("relative-json-pointer", "/abs", False),
    ("date", "2026-08-17", True),
    ("date", "2026-13-01", False),
    ("date-time", "2026-08-17T10:11:12Z", True),
    ("date-time", "yesterday", False),
    ("time", "23:59:60Z", True),
    ("time", "24:00:00Z", False),
    ("duration", "P3DT4H", True),
    ("duration", "3 days", False),
    ("ipv4", "192.168.0.1", True),
    ("ipv4", "256.1.1.1", False),
    ("ipv6", "2001:db8::1", True),
    ("ipv6", "2001:db8::g", False),
    ("hostname", "example-host.dev", True),
    ("hostname", "-bad.example", False),
    ("uri", "https://example.dev/a?b=c", True),
    ("uri", "not a uri", False),
    ("uuid", "123e4567-e89b-12d3-a456-426614174000", True),
    ("uuid", "123e4567", False),
    ("email", "a@b.co", True),
    # r4: dotless domains are now accepted (RFC 5321 allows them; the
    # official suite has no dotless-domain probe) — the old pragmatic
    # regex rejected a@b, the RFC-shaped grammar does not
    ("email", "a@b", True),
    ("email", '"joe bloggs"@example.com', True),
    ("email", ".test@example.com", False),
    ("email", "te..st@example.com", False),
    ("email", "joe@[127.0.0.1]", True),
    ("email", "joe@[127.0.0.300]", False),
]


@pytest.mark.parametrize("fmt,value,ok", CASES)
def test_format_asserted(spark, fmt, value, ok):
    check_case(spark, {"format": fmt}, value, ok, assert_formats=True)


def test_format_annotate_only_by_default(spark):
    # disabled-by-default semantics preserved (format.py:14-32)
    check_case(spark, {"format": "ipv4"}, "definitely-not-an-ip", True)


def test_unknown_format_never_asserts(spark):
    check_case(spark, {"format": "made-up-format"}, "anything", True, assert_formats=True)


def test_format_regex(spark):
    # jschon format registry 'regex' (vocabulary/format.py:47-66)
    check_case(spark, {"format": "regex"}, "^a[bc]+$", True, assert_formats=True)
    check_case(spark, {"format": "regex"}, "[", False, assert_formats=True)
    check_case(spark, {"format": "regex"}, "(unclosed", False, assert_formats=True)


def test_format_idn_hostname(spark):
    check_case(spark, {"format": "idn-hostname"}, "bücher.example", True, assert_formats=True)
    check_case(spark, {"format": "idn-hostname"}, "example.com", True, assert_formats=True)
    check_case(spark, {"format": "idn-hostname"}, "-bad-.example", False, assert_formats=True)
    check_case(spark, {"format": "idn-hostname"}, "", False, assert_formats=True)


def test_format_iri_family(spark):
    check_case(spark, {"format": "iri"}, "https://bücher.example/päth", True, assert_formats=True)
    check_case(spark, {"format": "iri"}, "not a uri", False, assert_formats=True)
    check_case(spark, {"format": "idn-email"}, "dörte@sörensen.example", True, assert_formats=True)
    check_case(spark, {"format": "idn-email"}, "no-at-sign", False, assert_formats=True)


def test_format_type_scoped(spark):
    # defined formats target strings: non-string instances pass
    # vacuously (reference validators are type-scoped)
    check_case(spark, {"format": "ipv4"}, 5, True, assert_formats=True)
    check_case(spark, {"format": "date"}, [1, 2], True, assert_formats=True)
    check_case(spark, {"format": "ipv4"}, "nope", False, assert_formats=True)
