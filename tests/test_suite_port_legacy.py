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
            ("no elements present", "P", True),
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
