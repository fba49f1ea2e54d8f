"""Legacy-dialect (draft-07 / 2019-09) and format-assertion slabs of the
JSON-Schema-Test-Suite, ported as literal parametrizations (same
provenance note as tests/test_suite_port.py; reference consumes these
from tests/JSON-Schema-Test-Suite/tests/{draft7,draft2019-09}/ via
tests/test_suite.py:143-158).

The legacy forms compile through the 2020-12 rewrite
(jschon_spark/compiler/legacy.py); these cases pin the rewrite against
the suite's own expectations. Format cases run with assert_formats=True
(the suite's optional/format-assertion configuration); only formats our
validators implement are included, with documented deltas excluded.
"""

from __future__ import annotations

import pytest

from jschon_spark.testing import Untypeable, check_case_in_group

D7 = {"$schema": "http://json-schema.org/draft-07/schema#"}
D19 = {"$schema": "https://json-schema.org/draft/2019-09/schema"}

LEGACY = [
    (
        "draft7: an array of schemas for items",
        {**D7, "items": [{"type": "integer"}, {"type": "string"}]},
        [
            ("correct types", [1, "foo"], True),
            ("wrong types", ["foo", 1], False),
            ("incomplete array of items", [1], True),
            ("array with additional items", [1, "foo", True], True),
            ("empty array", [], True),
        ],
    ),
    (
        "draft7: items with boolean schemas",
        {**D7, "items": [True, False]},
        [
            ("array with one item is valid", [1], True),
            ("array with two items is invalid", [1, "foo"], False),
            ("empty array is valid", [], True),
        ],
    ),
    (
        "draft7: additionalItems as schema",
        {**D7, "items": [{}], "additionalItems": {"type": "integer"}},
        [
            ("additional items match schema", [None, 2, 3, 4], True),
            ("additional items do not match schema", [None, 2, 3, "foo"], False),
        ],
    ),
    (
        "draft7: additionalItems as false without items",
        {**D7, "additionalItems": False},
        [
            ("items defaults to empty schema so everything is valid", [1, 2, 3, 4, 5], True),
            ("ignores non-arrays", {"foo": "bar"}, True),
        ],
    ),
    (
        "draft7: additionalItems are allowed by default",
        {**D7, "items": [{"type": "integer"}]},
        [
            ("only the first item is validated", [1, "foo", False], True),
        ],
    ),
    (
        "draft7: additionalItems does not look in applicators",
        {**D7, "allOf": [{"items": [{"type": "integer"}]}], "additionalItems": {"type": "boolean"}},
        [
            ("items defined in allOf are not examined", [1, None], True),
        ],
    ),
    (
        "draft7: dependencies (property form)",
        {**D7, "dependencies": {"bar": ["foo"]}},
        [
            ("neither", {}, True),
            ("nondependant", {"foo": 1}, True),
            ("with dependency", {"foo": 1, "bar": 2}, True),
            ("missing dependency", {"bar": 2}, False),
            ("ignores arrays", ["bar"], True),
            ("ignores strings", "foobar", True),
        ],
    ),
    (
        "draft7: dependencies (schema form)",
        {
            **D7,
            "dependencies": {
                "bar": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}}}
            },
        },
        [
            ("valid", {"foo": 1, "bar": 2}, True),
            ("no dependency", {"foo": "quux"}, True),
            ("wrong type", {"foo": "quux", "bar": 2}, False),
            ("wrong type other", {"foo": 2, "bar": "quux"}, False),
            ("wrong type both", {"foo": "quux", "bar": "quux"}, False),
        ],
    ),
    (
        "draft7: dependencies with boolean subschemas",
        {**D7, "dependencies": {"foo": True, "bar": False}},
        [
            ("object with property having schema true is valid", {"foo": 1}, True),
            ("object with property having schema false is invalid", {"bar": 2}, False),
            ("object with both properties is invalid", {"foo": 1, "bar": 2}, False),
            ("empty object is valid", {}, True),
        ],
    ),
    (
        "draft7: multiple dependencies (mixed forms)",
        {
            **D7,
            "dependencies": {
                "quux": ["foo", "bar"],
                "foo": {"properties": {"foo": {"type": "integer"}}},
            },
        },
        [
            ("neither", {}, True),
            ("schema dependency satisfied", {"foo": 1}, True),
            ("schema dependency violated", {"foo": "x"}, False),
            ("property dependency satisfied", {"foo": 1, "bar": 2, "quux": 3}, True),
            ("property dependency missing one", {"foo": 1, "quux": 3}, False),
        ],
    ),
    (
        "draft7: definitions + $ref spelling",
        {**D7, "definitions": {"pos": {"type": "integer", "minimum": 0}}, "$ref": "#/definitions/pos"},
        [
            ("valid", 5, True),
            ("negative invalid", -5, False),
            ("string invalid", "x", False),
        ],
    ),
    (
        "draft4-style boolean exclusiveMaximum",
        {"maximum": 3.0, "exclusiveMaximum": True},
        [
            ("below the maximum is valid", 2.2, True),
            ("boundary point is invalid", 3.0, False),
            ("above the maximum is invalid", 3.5, False),
        ],
    ),
    (
        "draft4-style boolean exclusiveMinimum false is plain minimum",
        {"minimum": 1.1, "exclusiveMinimum": False},
        [
            ("boundary point is valid", 1.1, True),
            ("below the minimum is invalid", 0.6, False),
        ],
    ),
    (
        "2019-09: $recursiveRef without $recursiveAnchor works like $ref",
        {
            **D19,
            "properties": {"foo": {"$recursiveRef": "#"}},
        },
        [
            ("integer does not match as a property value", {"foo": 1}, True),
            ("recursive match", {"foo": {"foo": {}}}, True),
        ],
    ),
    (
        "2019-09: $recursiveRef with $recursiveAnchor in same document",
        {
            **D19,
            "$id": "https://ex.test/r19/outer",
            "$recursiveAnchor": True,
            "type": "object",
            "properties": {"children": {"type": "array", "items": {"$recursiveRef": "#"}}},
        },
        [
            ("single level valid", {"children": []}, True),
            ("two levels valid", {"children": [{"children": []}]}, True),
            # a null-valued children property is PRESENT and fails
            # {"type": "array"} (explicit-null presence semantics)
            ("null children is invalid", {"children": None}, False),
        ],
    ),
    (
        "2019-09: unevaluatedProperties lives in the applicator vocabulary",
        {
            **D19,
            "properties": {"foo": {"type": "string"}},
            "unevaluatedProperties": False,
        },
        [
            ("no unevaluated properties", {"foo": "a"}, True),
            ("unevaluated property", {"foo": "a", "bar": "b"}, False),
        ],
    ),
    (
        "2019-09: tuple items",
        {**D19, "items": [{"type": "integer"}, {"type": "string"}]},
        [
            ("correct types", [1, "foo"], True),
            ("wrong types", ["foo", 1], False),
        ],
    ),
]

# optional/format cases, run with format assertion ON (the dialect's
# format-assertion configuration). Only formats with implemented
# validators; known documented deltas excluded (see core.py comments).
FORMAT_ASSERT = [
    (
        "date-time",
        {"format": "date-time"},
        [
            ("a valid date-time string", "1963-06-19T08:30:06.283185Z", True),
            ("a valid date-time string without second fraction", "1963-06-19T08:30:06Z", True),
            ("a valid date-time with plus offset", "1937-01-01T12:00:27.87+00:20", True),
            ("an invalid day in date-time string", "1990-02-31T15:59:60.123-08:00", False),
            ("an invalid closing Z after time-zone offset", "1963-06-19T08:30:06.28123+01:00Z", False),
            ("an invalid date-time string", "06/19/1963 08:30:06 PST", False),
            ("only RFC3339 not all of ISO 8601 are valid", "2013-350T01:01:01", False),
            ("a valid date-time string with lowercase z", "1963-06-19t08:30:06z", True),
        ],
    ),
    (
        "date",
        {"format": "date"},
        [
            ("a valid date string", "1963-06-19", True),
            ("an invalid date-time string", "06/19/1963", False),
            ("an invalid month", "1998-13-01", False),
            ("an invalid day", "1998-04-31", False),
            ("only RFC3339 not all of ISO 8601 are valid", "1998-1-20", False),
            ("non-padded day dates are invalid", "1998-01-1", False),
        ],
    ),
    (
        "time",
        {"format": "time"},
        [
            ("a valid time string", "08:30:06Z", True),
            ("a valid time string with leap second", "23:59:60Z", True),
            ("an invalid time string with invalid hour", "24:00:00Z", False),
            ("an invalid time string with invalid minute", "00:60:00Z", False),
            ("an invalid time string with invalid second", "00:00:61Z", False),
            ("valid time with offset", "08:30:06+01:00", True),
            ("no offset is invalid (RFC 3339 full-time)", "08:30:06", False),
        ],
    ),
    (
        "duration",
        {"format": "duration"},
        [
            ("a valid duration string", "P4DT12H30M5S", True),
            ("an invalid duration string", "PT1D", False),
            # r4: "P" is now rejected (the suite's expectation) — the
            # upgraded duration grammar requires at least one element
            ("no elements present", "P", False),
            ("weeks cannot be combined with other units", "P1Y2W", False),
            ("element order matters... but P2D1Y is shape-invalid", "P2D1Y", False),
            ("four years duration", "P4Y", True),
            ("one minute duration", "PT1M", True),
        ],
    ),
    (
        "email",
        {"format": "email"},
        [
            ("a valid e-mail address", "joe.bloggs@example.com", True),
            ("an invalid e-mail address", "2962", False),
            ("an invalid e-mail with two @", "a@b@example.com", False),
        ],
    ),
    (
        "ipv4",
        {"format": "ipv4"},
        [
            ("a valid IP address", "192.168.0.1", True),
            ("an IP address with too many components", "127.0.0.0.1", False),
            ("an IP address with out-of-range values", "256.256.256.256", False),
            ("an IP address without 4 components", "127.0", False),
            ("an IP address as an integer string", "0x7f000001", False),
        ],
    ),
    (
        "ipv6",
        {"format": "ipv6"},
        [
            ("a valid IPv6 address", "::1", True),
            ("an IPv6 address with out-of-range values", "12345::", False),
            ("an IPv6 address with too many components", "1:1:1:1:1:1:1:1:1:1:1:1:1:1:1:1", False),
            ("an IPv6 address containing illegal characters", "::laptop", False),
            ("no digits is valid", "::", True),
            ("leading colons is valid", "::42:ff:1", True),
            ("trailing colons is valid", "d6::", True),
            ("two sets of double colons is invalid", "1::d6::42", False),
            ("mixed format with the ipv4 section as decimal octets", "::ffff:192.168.0.1", True),
            ("mixed format with double colons between the sections", "1:2::192.168.0.1", True),
            ("mixed format with ipv4 section with octet out of range", "::ffff:256.168.0.1", False),
        ],
    ),
    (
        "hostname",
        {"format": "hostname"},
        [
            ("a valid host name", "www.example.com", True),
            ("a host name starting with an illegal character", "-a-host-name-that-starts-with--", False),
            ("a host name containing illegal characters", "not_a_valid_host_name", False),
            (
                "a host name with a component too long",
                "a-vvvvvvvvvvvvvvvveeeeeeeeeeeeeeeerrrrrrrrrrrrrrrryyyyyyyyyyyyyyyy-long-host-name-component",
                False,
            ),
            ("starts with hyphen", "-hostname", False),
            ("ends with hyphen", "hostname-", False),
            ("single label", "hostname", True),
            ("single label with digits", "host123name", True),
        ],
    ),
    (
        "uuid",
        {"format": "uuid"},
        [
            ("all upper-case", "2EB8AA08-AA98-11EA-B4AA-73B441D16380", True),
            ("all lower-case", "2eb8aa08-aa98-11ea-b4aa-73b441d16380", True),
            ("mixed case", "2eb8aa08-AA98-11ea-B4Aa-73B441D16380", True),
            ("wrong length", "2eb8aa08-aa98-11ea-b4aa-73b441d1638", False),
            ("missing section", "2eb8aa08-aa98-11ea-73b441d16380", False),
            ("bad characters (not hex)", "2eb8aa08-aa98-11ea-b4ga-73b441d16380", False),
            ("no dashes", "2eb8aa08aa9811eab4aa73b441d16380", False),
        ],
    ),
    (
        "json-pointer",
        {"format": "json-pointer"},
        [
            ("a valid JSON-pointer", "/foo/bar~0/baz~1/%a", True),
            ("not a valid JSON-pointer (~ not escaped)", "/foo/bar~", False),
            ("valid JSON-pointer with empty segment", "/foo//bar", True),
            ("valid JSON-pointer with the last empty segment", "/foo/bar/", True),
            ("valid JSON-pointer as stated in RFC 6901 #1", "", True),
            ("valid JSON-pointer as stated in RFC 6901 #2", "/foo", True),
            ("valid JSON-pointer (escaped)", "/i~0j", True),
            ("not a valid JSON-pointer (URI Fragment Identifier) #1", "#", False),
            ("not a valid JSON-pointer (some escaped, but not all) #1", "/~0~", False),
            ("not a valid JSON-pointer (isn't empty nor starts with /) #1", "a", False),
        ],
    ),
    (
        "relative-json-pointer",
        {"format": "relative-json-pointer"},
        [
            ("a valid upwards RJP", "1", True),
            ("a valid downwards RJP", "0/foo/bar", True),
            ("a valid up and then down RJP, with array index", "2/0/baz/1/zip", True),
            ("a valid RJP taking the member or index name", "0#", True),
            ("an invalid RJP that is a valid JSON Pointer", "/foo/bar", False),
            ("negative prefix", "-1/foo/bar", False),
            ("## is not a valid RJP", "0##", False),
            ("zero cannot be followed by other digits, plus json-pointer", "01/a", False),
        ],
    ),
    (
        "regex",
        {"format": "regex"},
        [
            ("a valid regular expression", "([abc])+\\s+$", True),
            ("a regular expression with unclosed parens is invalid", "^(abc]", False),
        ],
    ),
    (
        "unknown formats annotate even under assertion",
        {"format": "unknown-format-xyz"},
        [
            ("anything passes", "whatever", True),
        ],
    ),
]

SUITE = [("legacy", *g, False) for g in LEGACY] + [
    ("format-assert", *g, True) for g in FORMAT_ASSERT
]

# (group index, test index) parametrization over memoized batched groups
# — see tests/test_suite_port.py
CASES = [
    pytest.param(gi, ti, id=f"{fname}|{gdesc}|{tdesc}")
    for gi, (fname, gdesc, schema, tests, assert_formats) in enumerate(SUITE)
    for ti, (tdesc, data, valid) in enumerate(tests)
]

_BATCH: dict = {}


@pytest.mark.parametrize("gi,ti", CASES)
def test_suite_case_legacy(spark, gi, ti):
    _fname, _gdesc, schema, tests, assert_formats = SUITE[gi]
    try:
        check_case_in_group(
            spark, schema, tests, ti, _BATCH, gi, assert_formats=assert_formats
        )
    except Untypeable as e:
        pytest.skip(f"no single Spark type for instance (typed-column delta): {e}")


def test_legacy_dialect_keyword_gating(spark):
    """Keywords a pre-2019-09 dialect never defined are unknown there
    and must be IGNORED, not asserted (draft-07 core §6.5): draft-07
    has no unevaluated*, draft-06 no if/then/else, draft-04 no
    const/contains/propertyNames. Static per-dialect keyword sets in
    _dialect_for (post-rewrite names)."""
    from jschon_spark.testing import evaluate_instance

    D6 = {"$schema": "http://json-schema.org/draft-06/schema#"}
    D4 = {"$schema": "http://json-schema.org/draft-04/schema#"}
    cases = [
        ({**D7, "properties": {"a": {}}, "unevaluatedProperties": False},
         {"a": 1, "b": 2}, True),
        ({**D6, "if": {"type": "integer"}, "then": {"minimum": 5}}, 1, True),
        ({**D7, "if": {"type": "integer"}, "then": {"minimum": 5}}, 1, False),
        ({**D4, "const": 5}, 1, True),
        ({**D6, "const": 5}, 1, False),
        ({**D7, "contains": {"minimum": 5}}, [1, 2], False),
        ({**D4, "contains": {"minimum": 5}}, [1, 2], True),
    ]
    for schema, data, want in cases:
        got, viols = evaluate_instance(spark, schema, data)
        assert got is want, (schema, data, got, viols)


def test_draft7_ref_overrides_siblings(spark):
    """Pre-2019-09 $ref ignores every sibling keyword (draft-07 core
    §8.3; official suite draft7/ref.json 'ref overrides any sibling
    keywords') — siblings stay addressable for JSON-pointer refs but do
    not assert. 2019-09 made $ref a regular keyword."""
    from jschon_spark.testing import evaluate_instance

    s7 = {**D7,
          "definitions": {"reffed": {"type": "array"}},
          "properties": {"foo": {"$ref": "#/definitions/reffed", "maxItems": 2}}}
    assert evaluate_instance(spark, s7, {"foo": [1, 2, 3]})[0] is True  # maxItems ignored
    assert evaluate_instance(spark, s7, {"foo": "string"})[0] is False  # ref still asserts
    # 2019-09: the sibling asserts alongside $ref
    s19 = {**D19,
           "$defs": {"reffed": {"type": "array"}},
           "properties": {"foo": {"$ref": "#/$defs/reffed", "maxItems": 2}}}
    assert evaluate_instance(spark, s19, {"foo": [1, 2, 3]})[0] is False


def test_2019_09_unevaluatedItems_ignores_contains(spark):
    """2019-09 unevaluatedItems collects only items / additionalItems /
    unevaluatedItems annotations — NOT contains (reference
    legacy.py:114-137), so contains-matched elements stay unevaluated;
    2020-12 added contains to the coverage set (applicator.py:235-265).
    Verified against the reference live (round 3)."""
    from jschon_spark.testing import evaluate_instance

    s19 = {**D19, "contains": {"minimum": 2}, "unevaluatedItems": False}
    s20 = {"$schema": "https://json-schema.org/draft/2020-12/schema",
           "contains": {"minimum": 2}, "unevaluatedItems": False}
    # every element contains-matched: 2019-09 still rejects, 2020-12 accepts
    assert evaluate_instance(spark, s19, [2, 3])[0] is False
    assert evaluate_instance(spark, s20, [2, 3])[0] is True
    # an unmatched element fails under both
    assert evaluate_instance(spark, s19, [1, 2])[0] is False
    assert evaluate_instance(spark, s20, [1, 2])[0] is False
    # the delta also blocks contains coverage from BRANCH sources
    s19b = {**D19, "allOf": [{"contains": {"minimum": 2}}], "unevaluatedItems": False}
    assert evaluate_instance(spark, s19b, [2, 3])[0] is False


def test_2019_09_additionalItems_discarded_when_tuple_items_fails(spark):
    """2019-09 additionalItems depends on the items ANNOTATION, which is
    only set when every tuple index passes (reference legacy.py:76-85);
    on tuple failure additionalItems is discarded — no assertion and no
    error rows — while 2020-12 `items` would apply unconditionally.
    Found by the differential fuzzer (seed 55010)."""
    from jschon_spark.testing import evaluate_instance

    schema = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "items": [{"minLength": 2}],
        "additionalItems": {"minLength": 4},
    }
    # tuple fails on index 0 → additionalItems discarded: no /1 rows
    valid, viols = evaluate_instance(spark, schema, ["", "x"])
    assert not valid
    assert [(v.instance_path, v.keyword) for v in viols] == [("/0", "minLength")]
    # tuple passes → additionalItems applies and fails on /1
    valid, viols = evaluate_instance(spark, schema, ["ok", "x"])
    assert not valid
    assert [(v.instance_path, v.keyword) for v in viols] == [("/1", "minLength")]
    # both pass
    valid, viols = evaluate_instance(spark, schema, ["ok", "long enough"])
    assert valid and viols == []


# --------------------------------------------------------------------------
# optional/format/*.json (draft2020-12) under format-assertion
# (assert_formats=True). All 256 cases probe-verified green against the
# upgraded validators (core.py _BUILTIN_FORMATS, round 4): contextual
# leap-second rules for time/date-time, strict duration element rules,
# RFC 5321 quoted-string/address-literal email forms, leading-zero-free
# ipv4 octets, and RFC 4291 embedded-IPv4 tails in every legal position.
# The reference ships no validators for these (format assertions xfail
# in its suite run), so these cases assert the Spark engine only.

FORMAT_ASSERTION_2020 = [
    ("format/date: validation of date strings",
     {'format': 'date'},
     [
      ('a valid date string', '1963-06-19', True),
      ('a valid date string with 31 days in January', '2020-01-31', True),
      ('a invalid date string with 32 days in January', '2020-01-32', False),
      ('a valid date string with 28 days in February (normal)', '2021-02-28', True),
      ('a invalid date string with 29 days in February (normal)', '2021-02-29', False),
      ('a valid date string with 29 days in February (leap)', '2020-02-29', True),
      ('a invalid date string with 30 days in February (leap)', '2020-02-30', False),
      ('a valid date string with 31 days in March', '2020-03-31', True),
      ('a invalid date string with 32 days in March', '2020-03-32', False),
      ('a valid date string with 30 days in April', '2020-04-30', True),
      ('a invalid date string with 31 days in April', '2020-04-31', False),
      ('a valid date string with 31 days in May', '2020-05-31', True),
      ('a invalid date string with 32 days in May', '2020-05-32', False),
      ('a valid date string with 30 days in June', '2020-06-30', True),
      ('a invalid date string with 31 days in June', '2020-06-31', False),
      ('a valid date string with 31 days in July', '2020-07-31', True),
      ('a invalid date string with 32 days in July', '2020-07-32', False),
      ('a valid date string with 31 days in August', '2020-08-31', True),
      ('a invalid date string with 32 days in August', '2020-08-32', False),
      ('a valid date string with 30 days in September', '2020-09-30', True),
      ('a invalid date string with 31 days in September', '2020-09-31', False),
      ('a valid date string with 31 days in October', '2020-10-31', True),
      ('a invalid date string with 32 days in October', '2020-10-32', False),
      ('a valid date string with 30 days in November', '2020-11-30', True),
      ('a invalid date string with 31 days in November', '2020-11-31', False),
      ('a valid date string with 31 days in December', '2020-12-31', True),
      ('a invalid date string with 32 days in December', '2020-12-32', False),
      ('a invalid date string with invalid month', '2020-13-01', False),
      ('an invalid date string', '06/19/1963', False),
      ('only RFC3339 not all of ISO 8601 are valid', '2013-350', False),
      ('invalidates non-padded month dates', '1998-1-20', False),
      ('invalidates non-padded day dates', '1998-01-1', False),
      ('invalid month', '1998-13-01', False),
      ('invalid month-day combination', '1998-04-31', False),
      ('2021 is not a leap year', '2021-02-29', False),
      ('2020 is a leap year', '2020-02-29', True),
      ('invalid non-ASCII digit (BENGALI 4)', '1963-06-1৪', False),
      ('ISO8601 / non-RFC3339: YYYYMMDD without dashes (2023-03-28)', '20230328', False),
      ('ISO8601 / non-RFC3339: week number implicit day of week (2023-01-02)', '2023-W01', False),
      ('ISO8601 / non-RFC3339: week number with day of week (2023-03-28)', '2023-W13-2', False),
      ('ISO8601 / non-RFC3339: week number rollover to next year (2023-01-01)', '2022W527', False),
     ]),
    ("format/time: validation of time strings",
     {'format': 'time'},
     [
      ('a valid time string', '08:30:06Z', True),
      ('invalid time string with extra leading zeros', '008:030:006Z', False),
      ('invalid time string with no leading zero for single digit', '8:3:6Z', False),
      ('hour, minute, second must be two digits', '8:0030:6Z', False),
      ('a valid time string with leap second, Zulu', '23:59:60Z', True),
      ('invalid leap second, Zulu (wrong hour)', '22:59:60Z', False),
      ('invalid leap second, Zulu (wrong minute)', '23:58:60Z', False),
      ('valid leap second, zero time-offset', '23:59:60+00:00', True),
      ('invalid leap second, zero time-offset (wrong hour)', '22:59:60+00:00', False),
      ('invalid leap second, zero time-offset (wrong minute)', '23:58:60+00:00', False),
      ('valid leap second, positive time-offset', '01:29:60+01:30', True),
      ('valid leap second, large positive time-offset', '23:29:60+23:30', True),
      ('invalid leap second, positive time-offset (wrong hour)', '23:59:60+01:00', False),
      ('invalid leap second, positive time-offset (wrong minute)', '23:59:60+00:30', False),
      ('valid leap second, negative time-offset', '15:59:60-08:00', True),
      ('valid leap second, large negative time-offset', '00:29:60-23:30', True),
      ('invalid leap second, negative time-offset (wrong hour)', '23:59:60-01:00', False),
      ('invalid leap second, negative time-offset (wrong minute)', '23:59:60-00:30', False),
      ('a valid time string with second fraction', '23:20:50.52Z', True),
      ('a valid time string with precise second fraction', '08:30:06.283185Z', True),
      ('a valid time string with plus offset', '08:30:06+00:20', True),
      ('a valid time string with minus offset', '08:30:06-08:00', True),
      ('hour, minute in time-offset must be two digits', '08:30:06-8:000', False),
      ('a valid time string with case-insensitive Z', '08:30:06z', True),
      ('an invalid time string with invalid hour', '24:00:00Z', False),
      ('an invalid time string with invalid minute', '00:60:00Z', False),
      ('an invalid time string with invalid second', '00:00:61Z', False),
      ('an invalid time string with invalid leap second (wrong hour)', '22:59:60Z', False),
      ('an invalid time string with invalid leap second (wrong minute)', '23:58:60Z', False),
      ('an invalid time string with invalid time numoffset hour', '01:02:03+24:00', False),
      ('an invalid time string with invalid time numoffset minute', '01:02:03+00:60', False),
      ('an invalid time string with invalid time with both Z and numoffset', '01:02:03Z+00:30', False),
      ('an invalid offset indicator', '08:30:06 PST', False),
      ('only RFC3339 not all of ISO 8601 are valid', '01:01:01,1111', False),
      ('no time offset', '12:00:00', False),
      ('no time offset with second fraction', '12:00:00.52', False),
      ('invalid non-ASCII digit (BENGALI 2)', '1২:00:00Z', False),
      ('offset not starting with plus or minus', '08:30:06#00:20', False),
      ('contains letters', 'ab:cd:ef', False),
     ]),
    ("format/date-time: validation of date-time strings",
     {'format': 'date-time'},
     [
      ('a valid date-time string', '1963-06-19T08:30:06.283185Z', True),
      ('a valid date-time string without second fraction', '1963-06-19T08:30:06Z', True),
      ('a valid date-time string with plus offset', '1937-01-01T12:00:27.87+00:20', True),
      ('a valid date-time string with minus offset', '1990-12-31T15:59:50.123-08:00', True),
      ('a valid date-time with a leap second, UTC', '1998-12-31T23:59:60Z', True),
      ('a valid date-time with a leap second, with minus offset', '1998-12-31T15:59:60.123-08:00', True),
      ('an invalid date-time past leap second, UTC', '1998-12-31T23:59:61Z', False),
      ('an invalid date-time with leap second on a wrong minute, UTC', '1998-12-31T23:58:60Z', False),
      ('an invalid date-time with leap second on a wrong hour, UTC', '1998-12-31T22:59:60Z', False),
      ('an invalid day in date-time string', '1990-02-31T15:59:59.123-08:00', False),
      ('an invalid offset in date-time string', '1990-12-31T15:59:59-24:00', False),
      ('an invalid closing Z after time-zone offset', '1963-06-19T08:30:06.28123+01:00Z', False),
      ('an invalid date-time string', '06/19/1963 08:30:06 PST', False),
      ('case-insensitive T and Z', '1963-06-19t08:30:06.283185z', True),
      ('only RFC3339 not all of ISO 8601 are valid', '2013-350T01:01:01', False),
      ('invalid non-padded month dates', '1963-6-19T08:30:06.283185Z', False),
      ('invalid non-padded day dates', '1963-06-1T08:30:06.283185Z', False),
      ('invalid non-ASCII digit (BENGALI 2)', '1963-06-1২T00:00:00Z', False),
      ('invalid date-time with a space instead of T', '1963-06-19 08:30:06.283185Z', False),
     ]),
    ("format/duration: validation of duration strings",
     {'format': 'duration'},
     [
      ('a valid duration string', 'P4DT12H30M5S', True),
      ('an invalid duration string', 'PT1D', False),
      ('no elements present', 'P', False),
      ('no time elements present', 'P1DT', False),
      ('no date or time elements present', 'PT', False),
      ('elements out of order', 'P2D1Y', False),
      ('missing time separator', 'P1D2H', False),
      ('time element in the date position', 'P2S', False),
      ('four years duration', 'P4Y', True),
      ('zero time, in seconds', 'PT0S', True),
      ('zero time, in days', 'P0D', True),
      ('one month duration', 'P1M', True),
      ('one minute duration', 'PT1M', True),
      ('one and a half days, in hours', 'PT36H', True),
      ('one and a half days, in days and hours', 'P1DT12H', True),
      ('two weeks', 'P2W', True),
      ('weeks cannot be combined with other units', 'P1Y2W', False),
      ('invalid non-ASCII digit (BENGALI 2)', 'P২Y', False),
      ('element without unit', 'P1', False),
     ]),
    ("format/email: validation of email strings",
     {'format': 'email'},
     [
      ('a valid e-mail address', 'joe.bloggs@example.com', True),
      ('an invalid e-mail address', '2962', False),
      ('tilde in local part is valid', 'te~st@example.com', True),
      ('tilde before local part is valid', '~test@example.com', True),
      ('tilde after local part is valid', 'test~@example.com', True),
      ('a quoted string with a space in the local part is valid', '"joe bloggs"@example.com', True),
      ('a quoted string with a double dot in the local part is valid', '"joe..bloggs"@example.com', True),
      ('a quoted string with a @ in the local part is valid', '"joe@bloggs"@example.com', True),
      ('an IPv4-address-literal after the @ is valid', 'joe.bloggs@[127.0.0.1]', True),
      ('an IPv6-address-literal after the @ is valid', 'joe.bloggs@[IPv6:::1]', True),
      ('dot before local part is not valid', '.test@example.com', False),
      ('dot after local part is not valid', 'test.@example.com', False),
      ('two separated dots inside local part are valid', 'te.s.t@example.com', True),
      ('two subsequent dots inside local part are not valid', 'te..st@example.com', False),
      ('an invalid domain', 'joe.bloggs@invalid=domain.com', False),
      ('an invalid IPv4-address-literal', 'joe.bloggs@[127.0.0.300]', False),
     ]),
    ("format/hostname: validation of hostname strings",
     {'format': 'hostname'},
     [
      ('a valid host name', 'www.example.com', True),
      ('a valid punycoded IDN hostname', 'xn--4gbwdl.xn--wgbh1c', True),
      ('a host name starting with an illegal character', '-a-host-name-that-starts-with--', False),
      ('a host name containing illegal characters', 'not_a_valid_host_name', False),
      ('a host name with a component too long', 'a-vvvvvvvvvvvvvvvveeeeeeeeeeeeeeeerrrrrrrrrrrrrrrryyyyyyyyyyyyyyyy-long-host-name-component', False),
      ('starts with hyphen', '-hostname', False),
      ('ends with hyphen', 'hostname-', False),
      ('starts with underscore', '_hostname', False),
      ('ends with underscore', 'hostname_', False),
      ('contains underscore', 'host_name', False),
      ('maximum label length', 'abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefghijk.com', True),
      ('exceeds maximum label length', 'abcdefghijklmnopqrstuvwxyzabcdefghijklmnopqrstuvwxyzabcdefghijkl.com', False),
      ('single label', 'hostname', True),
      ('single label with hyphen', 'host-name', True),
      ('single label with digits', 'h0stn4me', True),
      ('single label starting with digit', '1host', True),
      ('single label ending with digit', 'hostnam3', True),
     ]),
    ("format/ipv4: validation of ipv4 strings",
     {'format': 'ipv4'},
     [
      ('a valid IP address', '192.168.0.1', True),
      ('an IP address with too many components', '127.0.0.0.1', False),
      ('an IP address with out-of-range values', '256.256.256.256', False),
      ('an IP address without 4 components', '127.0', False),
      ('an IP address as an integer', '0x7f000001', False),
      ('an IP address as an integer (decimal)', '2130706433', False),
      ('invalid leading zeroes, as they are treated as octals', '087.10.0.1', False),
      ('value without leading zero is valid', '87.10.0.1', True),
      ('invalid non-ASCII digit (BENGALI 2)', '1২2.168.0.1', False),
      ('netmask is not a part of ipv4 address', '192.168.1.0/24', False),
     ]),
    ("format/ipv6: validation of ipv6 strings",
     {'format': 'ipv6'},
     [
      ('a valid IPv6 address', '::1', True),
      ('an IPv6 address with out-of-range values', '12345::', False),
      ('trailing 4 hex symbols is valid', '::abef', True),
      ('trailing 5 hex symbols is invalid', '::abcef', False),
      ('an IPv6 address with too many components', '1:1:1:1:1:1:1:1:1:1:1:1:1:1:1:1', False),
      ('an IPv6 address containing illegal characters', '::laptop', False),
      ('no digits is valid', '::', True),
      ('leading colons is valid', '::42:ff:1', True),
      ('trailing colons is valid', 'd6::', True),
      ('missing leading octet is invalid', ':2:3:4:5:6:7:8', False),
      ('missing trailing octet is invalid', '1:2:3:4:5:6:7:', False),
      ('missing leading octet with omitted octets later', ':2:3:4::8', False),
      ('single set of double colons in the middle is valid', '1:d6::42', True),
      ('two sets of double colons is invalid', '1::d6::42', False),
      ('mixed format with the ipv4 section as decimal octets', '1::d6:192.168.0.1', True),
      ('mixed format with double colons between the sections', '1:2::192.168.0.1', True),
      ('mixed format with ipv4 section with octet out of range', '1::2:192.168.256.1', False),
      ('mixed format with ipv4 section with a hex octet', '1::2:192.168.ff.1', False),
      ('mixed format with leading double colons (ipv4-mapped ipv6 address)', '::ffff:192.168.0.1', True),
      ('triple colons is invalid', ':::42:ff:1', False),
      ('8 octets', '1:2:3:4:5:6:7:8', True),
      ('insufficient octets without double colons', '1:2:3:4:5:6:7', False),
      ('no colons is invalid', '1', False),
      ('ipv4 is not ipv6', '127.0.0.1', False),
      ('ipv4 segment must have 4 octets', '1:2:3:4:1.2.3', False),
      ('leading whitespace is invalid', ' ::1', False),
      ('trailing whitespace is invalid', '::1 ', False),
      ('netmask is not a part of ipv6 address', 'fe80::/64', False),
      ('zone id is not a part of ipv6 address', 'fe80::a%eth1', False),
      ('a long valid ipv6', '1000:1000:1000:1000:1000:1000:255.255.255.255', True),
      ('a long invalid ipv6, below length limit, first', '100:100:100:100:100:100:255.255.255.255.255', False),
      ('a long invalid ipv6, below length limit, second', '100:100:100:100:100:100:100:255.255.255.255', False),
      ('invalid non-ASCII digit (BENGALI 4)', '1:2:3:4:5:6:7:৪', False),
      ('invalid non-ASCII digit in the IPv4 portion (BENGALI 4)', '1:2::192.16৪.0.1', False),
     ]),
    ("format/json-pointer: validation of json-pointer strings",
     {'format': 'json-pointer'},
     [
      ('a valid JSON-pointer', '/foo/bar~0/baz~1/%a', True),
      ('not a valid JSON-pointer (~ not escaped)', '/foo/bar~', False),
      ('valid JSON-pointer with empty segment', '/foo//bar', True),
      ('valid JSON-pointer with the last empty segment', '/foo/bar/', True),
      ('valid JSON-pointer as stated in RFC 6901 #1', '', True),
      ('valid JSON-pointer as stated in RFC 6901 #2', '/foo', True),
      ('valid JSON-pointer as stated in RFC 6901 #3', '/foo/0', True),
      ('valid JSON-pointer as stated in RFC 6901 #4', '/', True),
      ('valid JSON-pointer as stated in RFC 6901 #5', '/a~1b', True),
      ('valid JSON-pointer as stated in RFC 6901 #6', '/c%d', True),
      ('valid JSON-pointer as stated in RFC 6901 #7', '/e^f', True),
      ('valid JSON-pointer as stated in RFC 6901 #8', '/g|h', True),
      ('valid JSON-pointer as stated in RFC 6901 #9', '/i\\j', True),
      ('valid JSON-pointer as stated in RFC 6901 #10', '/k"l', True),
      ('valid JSON-pointer as stated in RFC 6901 #11', '/ ', True),
      ('valid JSON-pointer as stated in RFC 6901 #12', '/m~0n', True),
      ('valid JSON-pointer used adding to the last array position', '/foo/-', True),
      ('valid JSON-pointer (- used as object member name)', '/foo/-/bar', True),
      ('valid JSON-pointer (multiple escaped characters)', '/~1~0~0~1~1', True),
      ('valid JSON-pointer (escaped with fraction part) #1', '/~1.1', True),
      ('valid JSON-pointer (escaped with fraction part) #2', '/~0.1', True),
      ('not a valid JSON-pointer (URI Fragment Identifier) #1', '#', False),
      ('not a valid JSON-pointer (URI Fragment Identifier) #2', '#/', False),
      ('not a valid JSON-pointer (URI Fragment Identifier) #3', '#a', False),
      ('not a valid JSON-pointer (some escaped, but not all) #1', '/~0~', False),
      ('not a valid JSON-pointer (some escaped, but not all) #2', '/~0/~', False),
      ('not a valid JSON-pointer (wrong escape character) #1', '/~2', False),
      ('not a valid JSON-pointer (wrong escape character) #2', '/~-1', False),
      ('not a valid JSON-pointer (multiple characters not escaped)', '/~~', False),
      ("not a valid JSON-pointer (isn't empty nor starts with /) #1", 'a', False),
      ("not a valid JSON-pointer (isn't empty nor starts with /) #2", '0', False),
      ("not a valid JSON-pointer (isn't empty nor starts with /) #3", 'a/a', False),
     ]),
    ("format/relative-json-pointer: validation of relative-json-pointer strings",
     {'format': 'relative-json-pointer'},
     [
      ('a valid upwards RJP', '1', True),
      ('a valid downwards RJP', '0/foo/bar', True),
      ('a valid up and then down RJP, with array index', '2/0/baz/1/zip', True),
      ('a valid RJP taking the member or index name', '0#', True),
      ('an invalid RJP that is a valid JSON Pointer', '/foo/bar', False),
      ('negative prefix', '-1/foo/bar', False),
      ('explicit positive prefix', '+1/foo/bar', False),
      ('## is not a valid json-pointer', '0##', False),
      ('zero cannot be followed by other digits, plus json-pointer', '01/a', False),
      ('zero cannot be followed by other digits, plus octothorpe', '01#', False),
      ('empty string', '', False),
      ('multi-digit integer prefix', '120/foo/bar', True),
     ]),
    ("format/regex: validation of regex strings",
     {'format': 'regex'},
     [
      ('a valid regular expression', '([abc])+\\s+$', True),
      ('a regular expression with unclosed parens is invalid', '^(abc]', False),
     ]),
    ("format/uuid: validation of uuid strings",
     {'format': 'uuid'},
     [
      ('all upper-case', '2EB8AA08-AA98-11EA-B4AA-73B441D16380', True),
      ('all lower-case', '2eb8aa08-aa98-11ea-b4aa-73b441d16380', True),
      ('mixed case', '2eb8aa08-AA98-11ea-B4Aa-73B441D16380', True),
      ('all zeroes is valid', '00000000-0000-0000-0000-000000000000', True),
      ('wrong length', '2eb8aa08-aa98-11ea-b4aa-73b441d1638', False),
      ('missing section', '2eb8aa08-aa98-11ea-73b441d16380', False),
      ('bad characters (not hex)', '2eb8aa08-aa98-11ea-b4ga-73b441d16380', False),
      ('no dashes', '2eb8aa08aa9811eab4aa73b441d16380', False),
      ('too few dashes', '2eb8aa08aa98-11ea-b4aa73b441d16380', False),
      ('too many dashes', '2eb8-aa08-aa98-11ea-b4aa73b441d16380', False),
      ('dashes in the wrong spot', '2eb8aa08aa9811eab4aa73b441d16380----', False),
      ('valid version 4', '98d80576-482e-427f-8434-7f86890ab222', True),
      ('valid version 5', '99c17cbb-656f-564a-940f-1a4568f03487', True),
      ('hypothetical version 6', '99c17cbb-656f-664a-940f-1a4568f03487', True),
      ('hypothetical version 15', '99c17cbb-656f-f64a-940f-1a4568f03487', True),
     ]),
]

FORMAT_CASES = [
    pytest.param(gi, ti, id=f"{gdesc}|{tdesc}")
    for gi, (gdesc, schema, tests) in enumerate(FORMAT_ASSERTION_2020)
    for ti, (tdesc, data, valid) in enumerate(tests)
]

_FORMAT_BATCH: dict = {}


@pytest.mark.parametrize("gi,ti", FORMAT_CASES)
def test_suite_case_format_assertion(spark, gi, ti):
    _gdesc, schema, tests = FORMAT_ASSERTION_2020[gi]
    check_case_in_group(
        spark, schema, tests, ti, _FORMAT_BATCH, gi, assert_formats=True
    )
