"""A large slab of the official JSON-Schema-Test-Suite (draft2020-12),
ported as literal parametrizations.

The reference consumes the suite as submodule JSON files
(/root/reference/tests/test_suite.py:143-158: {description, schema,
tests: [{description, data, valid}]}) with a 3,559-line xfail registry
(/root/reference/tests/suite_status.json). The submodule is EMPTY in
this sandbox, so the cases here are re-stated literally from the public
suite, keeping the suite's group/test descriptions so coverage can be
diffed against the original files.

Documented deltas (mirroring suite_status.json's xfail families):
- instances with no single Spark type (heterogeneous arrays, e.g. the
  [1, "foo"] prefixItems probes) SKIP via Untypeable — typed-column
  engine, SURVEY.md §2.9.1;
- float-overflow probes (multipleOf 0.123456789 vs 1e308) are xfail in
  the reference suite run too and are omitted;
- non-BMP regex ranges are xfail in the reference and omitted;
- remote-ref (refRemote.json), vocabulary.json, and format-assertion
  cases are ported in tests/test_suite_port_remote.py with their remote
  documents registered in the catalog (the reference's own harness
  serves them from local disk too — no network in either engine).
"""

from __future__ import annotations

import pytest

from jschon_spark.testing import Untypeable, check_case_in_group

# Each entry: (group description, schema, [(test description, data, valid)])
# Group/test descriptions are the suite's own.

BOOLEAN_SCHEMA = [
    (
        "boolean schema 'true'",
        True,
        [
            ("number is valid", 1, True),
            ("string is valid", "foo", True),
            ("boolean true is valid", True, True),
            ("boolean false is valid", False, True),
            ("null is valid", None, True),
            ("object is valid", {"foo": "bar"}, True),
            ("empty object is valid", {}, True),
            ("array is valid", ["foo"], True),
            ("empty array is valid", [], True),
        ],
    ),
    (
        "boolean schema 'false'",
        False,
        [
            ("number is invalid", 1, False),
            ("string is invalid", "foo", False),
            ("boolean true is invalid", True, False),
            ("boolean false is invalid", False, False),
            ("null is invalid", None, False),
            ("object is invalid", {"foo": "bar"}, False),
            ("empty object is invalid", {}, False),
            ("array is invalid", ["foo"], False),
            ("empty array is invalid", [], False),
        ],
    ),
]

TYPE = [
    (
        "integer type matches integers",
        {"type": "integer"},
        [
            ("an integer is an integer", 1, True),
            ("a float with zero fractional part is an integer", 1.0, True),
            ("a float is not an integer", 1.1, False),
            ("a string is not an integer", "foo", False),
            ("a string is still not an integer, even if it looks like one", "1", False),
            ("an object is not an integer", {}, False),
            ("an array is not an integer", [], False),
            ("a boolean is not an integer", True, False),
            ("null is not an integer", None, False),
        ],
    ),
    (
        "number type matches numbers",
        {"type": "number"},
        [
            ("an integer is a number", 1, True),
            ("a float with zero fractional part is a number (and an integer)", 1.0, True),
            ("a float is a number", 1.1, True),
            ("a string is not a number", "foo", False),
            ("a string is still not a number, even if it looks like one", "1", False),
            ("an object is not a number", {}, False),
            ("an array is not a number", [], False),
            ("a boolean is not a number", True, False),
            ("null is not a number", None, False),
        ],
    ),
    (
        "string type matches strings",
        {"type": "string"},
        [
            ("1 is not a string", 1, False),
            ("a float is not a string", 1.1, False),
            ("a string is a string", "foo", True),
            ("a string is still a string, even if it looks like a number", "1", True),
            ("an empty string is still a string", "", True),
            ("an object is not a string", {}, False),
            ("an array is not a string", [], False),
            ("a boolean is not a string", True, False),
            ("null is not a string", None, False),
        ],
    ),
    (
        "object type matches objects",
        {"type": "object"},
        [
            ("an integer is not an object", 1, False),
            ("a float is not an object", 1.1, False),
            ("a string is not an object", "foo", False),
            ("an object is an object", {}, True),
            ("an array is not an object", [], False),
            ("a boolean is not an object", True, False),
            ("null is not an object", None, False),
        ],
    ),
    (
        "array type matches arrays",
        {"type": "array"},
        [
            ("an integer is not an array", 1, False),
            ("a float is not an array", 1.1, False),
            ("a string is not an array", "foo", False),
            ("an object is not an array", {}, False),
            ("an array is an array", [], True),
            ("a boolean is not an array", True, False),
            ("null is not an array", None, False),
        ],
    ),
    (
        "boolean type matches booleans",
        {"type": "boolean"},
        [
            ("an integer is not a boolean", 1, False),
            ("zero is not a boolean", 0, False),
            ("a float is not a boolean", 1.1, False),
            ("a string is not a boolean", "foo", False),
            ("an empty string is not a boolean", "", False),
            ("an object is not a boolean", {}, False),
            ("an array is not a boolean", [], False),
            ("true is a boolean", True, True),
            ("false is a boolean", False, True),
            ("null is not a boolean", None, False),
        ],
    ),
    (
        "null type matches only the null object",
        {"type": "null"},
        [
            ("an integer is not null", 1, False),
            ("a float is not null", 1.1, False),
            ("zero is not null", 0, False),
            ("a string is not null", "foo", False),
            ("an empty string is not null", "", False),
            ("an object is not null", {}, False),
            ("an array is not null", [], False),
            ("true is not null", True, False),
            ("false is not null", False, False),
            ("null is null", None, True),
        ],
    ),
    (
        "multiple types can be specified in an array",
        {"type": ["integer", "string"]},
        [
            ("an integer is valid", 1, True),
            ("a string is valid", "foo", True),
            ("a float is invalid", 1.1, False),
            ("an object is invalid", {}, False),
            ("an array is invalid", [], False),
            ("a boolean is invalid", True, False),
            ("null is invalid", None, False),
        ],
    ),
    (
        "type as array with one item",
        {"type": ["string"]},
        [
            ("string is valid", "foo", True),
            ("number is invalid", 123, False),
        ],
    ),
    (
        "type: array or object",
        {"type": ["array", "object"]},
        [
            ("array is valid", [1, 2, 3], True),
            ("object is valid", {"foo": 123}, True),
            ("number is invalid", 123, False),
            ("string is invalid", "foo", False),
            ("null is invalid", None, False),
        ],
    ),
    (
        "type: array, object or null",
        {"type": ["array", "object", "null"]},
        [
            ("array is valid", [1, 2, 3], True),
            ("object is valid", {"foo": 123}, True),
            ("null is valid", None, True),
            ("number is invalid", 123, False),
            ("string is invalid", "foo", False),
        ],
    ),
]

ENUM = [
    (
        "simple enum validation",
        {"enum": [1, 2, 3]},
        [
            ("one of the enum is valid", 1, True),
            ("something else is invalid", 4, False),
        ],
    ),
    (
        "heterogeneous enum validation",
        {"enum": [6, "foo", [], True, {"foo": 12}]},
        [
            ("one of the enum is valid", [], True),
            ("something else is invalid", None, False),
            ("objects are deep compared", {"foo": False}, False),
            ("valid object matches", {"foo": 12}, True),
            ("extra properties in object is invalid", {"foo": 12, "boo": 42}, False),
        ],
    ),
    (
        "heterogeneous enum-with-null validation",
        {"enum": [6, None]},
        [
            ("null is valid", None, True),
            ("number is valid", 6, True),
            ("something else is invalid", "test", False),
        ],
    ),
    (
        "enums in properties",
        {
            "type": "object",
            "properties": {"foo": {"enum": ["foo"]}, "bar": {"enum": ["bar"]}},
            "required": ["bar"],
        },
        [
            ("both properties are valid", {"foo": "foo", "bar": "bar"}, True),
            ("wrong foo value", {"foo": "foot", "bar": "bar"}, False),
            ("wrong bar value", {"foo": "foo", "bar": "bart"}, False),
            ("missing optional property is valid", {"bar": "bar"}, True),
            ("missing required property is invalid", {"foo": "foo"}, False),
            ("missing all properties is invalid", {}, False),
        ],
    ),
    (
        "nul characters in strings",
        {"enum": ["hello\x00there"]},
        [
            ("match string with nul", "hello\x00there", True),
            ("do not match string lacking nul", "hellothere", False),
        ],
    ),
    (
        "enum with false does not match 0",
        {"enum": [False]},
        [
            ("false is valid", False, True),
            ("integer zero is invalid", 0, False),
            ("float zero is invalid", 0.0, False),
        ],
    ),
    (
        "enum with true does not match 1",
        {"enum": [True]},
        [
            ("true is valid", True, True),
            ("integer one is invalid", 1, False),
            ("float one is invalid", 1.0, False),
        ],
    ),
    (
        "enum with 0 does not match false",
        {"enum": [0]},
        [
            ("false is invalid", False, False),
            ("integer zero is valid", 0, True),
            ("float zero is valid", 0.0, True),
        ],
    ),
    (
        "enum with 1 does not match true",
        {"enum": [1]},
        [
            ("true is invalid", True, False),
            ("integer one is valid", 1, True),
            ("float one is valid", 1.0, True),
        ],
    ),
]

CONST = [
    (
        "const validation",
        {"const": 2},
        [
            ("same value is valid", 2, True),
            ("another value is invalid", 5, False),
            ("another type is invalid", "a", False),
        ],
    ),
    (
        "const with object",
        {"const": {"foo": "bar", "baz": "bax"}},
        [
            ("same object is valid", {"foo": "bar", "baz": "bax"}, True),
            ("same object with different property order is valid", {"baz": "bax", "foo": "bar"}, True),
            ("another object is invalid", {"foo": "bar"}, False),
            ("another type is invalid", [1, 2], False),
        ],
    ),
    (
        "const with array",
        {"const": [{"foo": "bar"}]},
        [
            ("same array is valid", [{"foo": "bar"}], True),
            ("another array item is invalid", [2], False),
            ("array with additional items is invalid", [1, 2, 3], False),
        ],
    ),
    (
        "const with null",
        {"const": None},
        [
            ("null is valid", None, True),
            ("not null is invalid", 0, False),
        ],
    ),
    (
        "const with false does not match 0",
        {"const": False},
        [
            ("false is valid", False, True),
            ("integer zero is invalid", 0, False),
            ("float zero is invalid", 0.0, False),
        ],
    ),
    (
        "const with true does not match 1",
        {"const": True},
        [
            ("true is valid", True, True),
            ("integer one is invalid", 1, False),
            ("float one is invalid", 1.0, False),
        ],
    ),
    (
        "const with 0 does not match other zero-like types",
        {"const": 0},
        [
            ("false is invalid", False, False),
            ("integer zero is valid", 0, True),
            ("float zero is valid", 0.0, True),
            ("empty object is invalid", {}, False),
            ("empty array is invalid", [], False),
            ("empty string is invalid", "", False),
        ],
    ),
    (
        "const with 1 does not match true",
        {"const": 1},
        [
            ("true is invalid", True, False),
            ("integer one is valid", 1, True),
            ("float one is valid", 1.0, True),
        ],
    ),
    (
        "const with -2.0 matches integer and float types",
        {"const": -2.0},
        [
            ("integer -2 is valid", -2, True),
            ("integer 2 is invalid", 2, False),
            ("float -2.0 is valid", -2.0, True),
            ("float 2.0 is invalid", 2.0, False),
            ("float -2.00001 is invalid", -2.00001, False),
        ],
    ),
    (
        "nul characters in strings",
        {"const": "hello\x00there"},
        [
            ("match string with nul", "hello\x00there", True),
            ("do not match string lacking nul", "hellothere", False),
        ],
    ),
]

NUMERIC = [
    (
        "by int",
        {"multipleOf": 2},
        [
            ("int by int", 10, True),
            ("int by int fail", 7, False),
            ("ignores non-numbers", "foo", True),
        ],
    ),
    (
        "by number",
        {"multipleOf": 1.5},
        [
            ("zero is multiple of anything", 0, True),
            ("4.5 is multiple of 1.5", 4.5, True),
            ("35 is not multiple of 1.5", 35, False),
        ],
    ),
    (
        "by small number",
        {"multipleOf": 0.0001},
        [
            ("0.0075 is multiple of 0.0001", 0.0075, True),
            ("0.00751 is not multiple of 0.0001", 0.00751, False),
        ],
    ),
    (
        "maximum validation",
        {"maximum": 3.0},
        [
            ("below the maximum is valid", 2.6, True),
            ("boundary point is valid", 3.0, True),
            ("above the maximum is invalid", 3.5, False),
            ("ignores non-numbers", "x", True),
        ],
    ),
    (
        "maximum validation with unsigned integer",
        {"maximum": 300},
        [
            ("below the maximum is invalid", 299.97, True),
            ("boundary point integer is valid", 300, True),
            ("boundary point float is valid", 300.00, True),
            ("above the maximum is invalid", 300.5, False),
        ],
    ),
    (
        "exclusiveMaximum validation",
        {"exclusiveMaximum": 3.0},
        [
            ("below the exclusiveMaximum is valid", 2.2, True),
            ("boundary point is invalid", 3.0, False),
            ("above the exclusiveMaximum is invalid", 3.5, False),
            ("ignores non-numbers", "x", True),
        ],
    ),
    (
        "minimum validation",
        {"minimum": 1.1},
        [
            ("above the minimum is valid", 2.6, True),
            ("boundary point is valid", 1.1, True),
            ("below the minimum is invalid", 0.6, False),
            ("ignores non-numbers", "x", True),
        ],
    ),
    (
        "minimum validation with signed integer",
        {"minimum": -2},
        [
            ("negative above the minimum is valid", -1, True),
            ("positive above the minimum is valid", 0, True),
            ("boundary point is valid", -2, True),
            ("boundary point with float is valid", -2.0, True),
            ("float below the minimum is invalid", -2.0001, False),
            ("int below the minimum is invalid", -3, False),
            ("ignores non-numbers", "x", True),
        ],
    ),
    (
        "exclusiveMinimum validation",
        {"exclusiveMinimum": 1.1},
        [
            ("above the exclusiveMinimum is valid", 1.2, True),
            ("boundary point is invalid", 1.1, False),
            ("below the exclusiveMinimum is invalid", 0.6, False),
            ("ignores non-numbers", "x", True),
        ],
    ),
]

STRINGS = [
    (
        "maxLength validation",
        {"maxLength": 2},
        [
            ("shorter is valid", "f", True),
            ("exact length is valid", "fo", True),
            ("too long is invalid", "foo", False),
            ("ignores non-strings", 100, True),
            ("two graphemes is long enough", "éé", True),
        ],
    ),
    (
        "minLength validation",
        {"minLength": 2},
        [
            ("longer is valid", "foo", True),
            ("exact length is valid", "fo", True),
            ("too short is invalid", "f", False),
            ("ignores non-strings", 1, True),
            ("one grapheme is not long enough", "é", False),
        ],
    ),
    (
        "pattern validation",
        {"pattern": "^a*$"},
        [
            ("a matching pattern is valid", "aaa", True),
            ("a non-matching pattern is invalid", "abc", False),
            ("ignores booleans", True, True),
            ("ignores integers", 123, True),
            ("ignores floats", 1.0, True),
            ("ignores objects", {}, True),
            ("ignores arrays", [], True),
            ("ignores null", None, True),
        ],
    ),
    (
        "pattern is not anchored",
        {"pattern": "a+"},
        [
            ("matches a substring", "xxaayy", True),
        ],
    ),
]

ARRAYS = [
    (
        "maxItems validation",
        {"maxItems": 2},
        [
            ("shorter is valid", [1], True),
            ("exact length is valid", [1, 2], True),
            ("too long is invalid", [1, 2, 3], False),
            ("ignores non-arrays", "foobar", True),
        ],
    ),
    (
        "minItems validation",
        {"minItems": 1},
        [
            ("longer is valid", [1, 2], True),
            ("exact length is valid", [1], True),
            ("too short is invalid", [], False),
            ("ignores non-arrays", "", True),
        ],
    ),
    (
        "uniqueItems validation",
        {"uniqueItems": True},
        [
            ("unique array of integers is valid", [1, 2], True),
            ("non-unique array of integers is invalid", [1, 1], False),
            ("non-unique array of more than two integers is invalid", [1, 2, 1], False),
            ("numbers are unique if mathematically unequal", [1.0, 1.00, 1], False),
            ("false is not equal to zero", [0, False], True),
            ("true is not equal to one", [1, True], True),
            ("unique array of strings is valid", ["foo", "bar", "baz"], True),
            ("non-unique array of strings is invalid", ["foo", "bar", "foo"], False),
            ("unique array of objects is valid", [{"foo": "bar"}, {"foo": "baz"}], True),
            ("non-unique array of objects is invalid", [{"foo": "bar"}, {"foo": "bar"}], False),
            (
                "unique array of nested objects is valid",
                [
                    {"foo": {"bar": {"baz": True}}},
                    {"foo": {"bar": {"baz": False}}},
                ],
                True,
            ),
            (
                "non-unique array of nested objects is invalid",
                [
                    {"foo": {"bar": {"baz": True}}},
                    {"foo": {"bar": {"baz": True}}},
                ],
                False,
            ),
            ("unique array of arrays is valid", [["foo"], ["bar"]], True),
            ("non-unique array of arrays is invalid", [["foo"], ["foo"]], False),
            ("non-unique array of more than two arrays is invalid", [["foo"], ["bar"], ["foo"]], False),
            ("1 and true are unique", [1, True], True),
            ("0 and false are unique", [0, False], True),
            ("[1] and [true] are unique", [[1], [True]], True),
            ("[0] and [false] are unique", [[0], [False]], True),
            ("nested [1] and [true] are unique", [[[1], "foo"], [[True], "foo"]], True),
            ("unique heterogeneous types are valid", [{}, [1], True, None, 1, "{}"], True),
            ("non-unique heterogeneous types are invalid", [{}, [1], True, None, {}, 1], False),
            ("different objects are unique", [{"a": 1, "b": 2}, {"a": 2, "b": 1}], True),
            (
                "objects are non-unique despite key order",
                [{"a": 1, "b": 2}, {"b": 2, "a": 1}],
                False,
            ),
            ("{\"a\": false} and {\"a\": 0} are unique", [{"a": False}, {"a": 0}], True),
            ("{\"a\": true} and {\"a\": 1} are unique", [{"a": True}, {"a": 1}], True),
        ],
    ),
    (
        "uniqueItems with an array of items",
        {"prefixItems": [{"type": "boolean"}, {"type": "boolean"}], "uniqueItems": True},
        [
            ("[false, true] from items array is valid", [False, True], True),
            ("[true, false] from items array is valid", [True, False], True),
            ("[false, false] from items array is not valid", [False, False], False),
            ("[true, true] from items array is not valid", [True, True], False),
        ],
    ),
    (
        "uniqueItems=false validation",
        {"uniqueItems": False},
        [
            ("unique array of integers is valid", [1, 2], True),
            ("non-unique array of integers is valid", [1, 1], True),
            ("1 and true are unique", [1, True], True),
            ("unique array of objects is valid", [{"foo": "bar"}, {"foo": "baz"}], True),
            ("non-unique array of objects is valid", [{"foo": "bar"}, {"foo": "bar"}], True),
        ],
    ),
]

OBJECTS = [
    (
        "maxProperties validation",
        {"maxProperties": 2},
        [
            ("shorter is valid", {"foo": 1}, True),
            ("exact length is valid", {"foo": 1, "bar": 2}, True),
            ("too long is invalid", {"foo": 1, "bar": 2, "baz": 3}, False),
            ("ignores arrays", [1, 2, 3], True),
            ("ignores strings", "foobar", True),
        ],
    ),
    (
        "maxProperties = 0 means the object is empty",
        {"maxProperties": 0},
        [
            ("no properties is valid", {}, True),
            ("one property is invalid", {"foo": 1}, False),
        ],
    ),
    (
        "minProperties validation",
        {"minProperties": 1},
        [
            ("longer is valid", {"foo": 1, "bar": 2}, True),
            ("exact length is valid", {"foo": 1}, True),
            ("too short is invalid", {}, False),
            ("ignores arrays", [], True),
            ("ignores strings", "", True),
        ],
    ),
    (
        "required validation",
        {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
        [
            ("present required property is valid", {"foo": 1}, True),
            ("non-present required property is invalid", {"bar": 1}, False),
            ("ignores arrays", [], True),
            ("ignores strings", "", True),
            ("ignores other non-objects", 12, True),
        ],
    ),
    (
        "required default validation",
        {"properties": {"foo": {}}},
        [
            ("not required by default", {}, True),
        ],
    ),
    (
        "required with empty array",
        {"properties": {"foo": {}}, "required": []},
        [
            ("property not required", {}, True),
        ],
    ),
    (
        "dependentRequired - single dependency",
        {"dependentRequired": {"bar": ["foo"]}},
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
        "dependentRequired - empty dependents",
        {"dependentRequired": {"bar": []}},
        [
            ("empty object", {}, True),
            ("object with one property", {"bar": 2}, True),
        ],
    ),
    (
        "dependentRequired - multiple dependents required",
        {"dependentRequired": {"quux": ["foo", "bar"]}},
        [
            ("neither", {}, True),
            ("nondependants", {"foo": 1, "bar": 2}, True),
            ("with dependencies", {"foo": 1, "bar": 2, "quux": 3}, True),
            ("missing dependency", {"foo": 1, "quux": 2}, False),
            ("missing other dependency", {"bar": 1, "quux": 2}, False),
            ("missing both dependencies", {"quux": 1}, False),
        ],
    ),
]

PROPERTIES = [
    (
        "object properties validation",
        {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
        [
            ("both properties present and valid is valid", {"foo": 1, "bar": "baz"}, True),
            ("one property invalid is invalid", {"foo": 1, "bar": {}}, False),
            ("both properties invalid is invalid", {"foo": [], "bar": {}}, False),
            ("doesn't invalidate other properties", {"quux": []}, True),
            ("ignores arrays", [], True),
            ("ignores other non-objects", 12, True),
        ],
    ),
    (
        "properties, patternProperties, additionalProperties interaction",
        {
            "properties": {"foo": {"type": "array", "maxItems": 3}, "bar": {"type": "array"}},
            "patternProperties": {"f.o": {"minItems": 2}},
            "additionalProperties": {"type": "integer"},
        },
        [
            ("property validates property", {"foo": [1, 2]}, True),
            ("property invalidates property", {"foo": [1, 2, 3, 4]}, False),
            ("patternProperty invalidates property", {"foo": []}, False),
            ("patternProperty validates nonproperty", {"fxo": [1, 2]}, True),
            ("patternProperty invalidates nonproperty", {"fxo": []}, False),
            ("additionalProperty ignores property", {"bar": []}, True),
            ("additionalProperty validates others", {"quux": 3}, True),
            ("additionalProperty invalidates others", {"quux": "foo"}, False),
        ],
    ),
    (
        "properties with null valued instance properties",
        {"properties": {"foo": {"type": "null"}}},
        [
            ("allows null values", {"foo": None}, True),
        ],
    ),
    (
        "patternProperties validates properties matching a regex",
        {"patternProperties": {"f.*o": {"type": "integer"}}},
        [
            ("a single valid match is valid", {"foo": 1}, True),
            ("multiple valid matches is valid", {"foo": 1, "foooooo": 2}, True),
            ("a single invalid match is invalid", {"foo": "bar", "fooooo": 2}, False),
            ("multiple invalid matches is invalid", {"foo": "bar", "foooooo": "baz"}, False),
            ("ignores arrays", ["foo"], True),
            ("ignores strings", "foo", True),
            ("ignores other non-objects", 12, True),
        ],
    ),
    (
        "multiple simultaneous patternProperties are validated",
        {"patternProperties": {"a*": {"type": "integer"}, "aaa*": {"maximum": 20}}},
        [
            ("a single valid match is valid", {"a": 21}, True),
            ("a simultaneous match is valid", {"aaaa": 18}, True),
            ("multiple matches is valid", {"a": 21, "aaaa": 18}, True),
            ("an invalid due to one is invalid", {"a": "bar"}, False),
            ("an invalid due to the other is invalid", {"aaaa": 31}, False),
            ("an invalid due to both is invalid", {"aaa": "foo", "aaaa": 31}, False),
        ],
    ),
    (
        "patternProperties with boolean schemas",
        {"patternProperties": {"f.*": True, "b.*": False}},
        [
            ("object with property matching schema true is valid", {"foo": 1}, True),
            ("object with property matching schema false is invalid", {"bar": 2}, False),
            ("object with both properties is invalid", {"foo": 1, "bar": 2}, False),
            ("object with a property matching both true and false is invalid", {"foobar": 1}, False),
            ("empty object is valid", {}, True),
        ],
    ),
    (
        "patternProperties with null valued instance properties",
        {"patternProperties": {"^.*bar$": {"type": "null"}}},
        [
            ("allows null values", {"foobar": None}, True),
        ],
    ),
    (
        "additionalProperties being false does not allow other properties",
        {
            "properties": {"foo": {}, "bar": {}},
            "patternProperties": {"^v": {}},
            "additionalProperties": False,
        },
        [
            ("no additional properties is valid", {"foo": 1}, True),
            ("an additional property is invalid", {"foo": 1, "bar": 2, "quux": "boom"}, False),
            ("ignores arrays", [1, 2, 3], True),
            ("ignores strings", "foobarbaz", True),
            ("ignores other non-objects", 12, True),
            ("patternProperties are not additional properties", {"foo": 1, "vroom": 2}, True),
        ],
    ),
    (
        "non-ASCII pattern with additionalProperties",
        {"patternProperties": {"^á": {}}, "additionalProperties": False},
        [
            ("matching the pattern is valid", {"ármányos": 2}, True),
            ("not matching the pattern is invalid", {"élmény": 2}, False),
        ],
    ),
    (
        "additionalProperties with schema",
        {"properties": {"foo": {}, "bar": {}}, "additionalProperties": {"type": "boolean"}},
        [
            ("no additional properties is valid", {"foo": 1}, True),
            ("an additional valid property is valid", {"foo": 1, "bar": 2, "quux": True}, True),
            ("an additional invalid property is invalid", {"foo": 1, "bar": 2, "quux": 12}, False),
        ],
    ),
    (
        "additionalProperties can exist by itself",
        {"additionalProperties": {"type": "boolean"}},
        [
            ("an additional valid property is valid", {"foo": True}, True),
            ("an additional invalid property is invalid", {"foo": 1}, False),
        ],
    ),
    (
        "additionalProperties are allowed by default",
        {"properties": {"foo": {}, "bar": {}}},
        [
            ("additional properties are allowed", {"foo": 1, "bar": 2, "quux": True}, True),
        ],
    ),
    (
        "additionalProperties does not look in applicators",
        {"allOf": [{"properties": {"foo": {}}}], "additionalProperties": {"type": "boolean"}},
        [
            ("properties defined in allOf are not examined", {"foo": 1, "bar": True}, False),
        ],
    ),
    (
        "additionalProperties with null valued instance properties",
        {"additionalProperties": {"type": "null"}},
        [
            ("allows null values", {"foo": None}, True),
        ],
    ),
    (
        "propertyNames validation",
        {"propertyNames": {"maxLength": 3}},
        [
            ("all property names valid", {"f": {}, "foo": {}}, True),
            ("some property names invalid", {"foo": {}, "foobar": {}}, False),
            ("object without properties is valid", {}, True),
            ("ignores arrays", [1, 2, 3, 4], True),
            ("ignores strings", "foobar", True),
            ("ignores other non-objects", 12, True),
        ],
    ),
    (
        "propertyNames with boolean schema true",
        {"propertyNames": True},
        [
            ("object with any properties is valid", {"foo": 1}, True),
            ("empty object is valid", {}, True),
        ],
    ),
    (
        "propertyNames with boolean schema false",
        {"propertyNames": False},
        [
            ("object with any properties is invalid", {"foo": 1}, False),
            ("empty object is valid", {}, True),
        ],
    ),
]

DEPENDENT_SCHEMAS = [
    (
        "single dependency",
        {"dependentSchemas": {"bar": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}}}}},
        [
            ("valid", {"foo": 1, "bar": 2}, True),
            ("no dependency", {"foo": "quux"}, True),
            ("wrong type", {"foo": "quux", "bar": 2}, False),
            ("wrong type other", {"foo": 2, "bar": "quux"}, False),
            ("wrong type both", {"foo": "quux", "bar": "quux"}, False),
            ("ignores arrays", ["bar"], True),
            ("ignores strings", "foobar", True),
            ("ignores other non-objects", 12, True),
        ],
    ),
    (
        "boolean subschemas",
        {"dependentSchemas": {"foo": True, "bar": False}},
        [
            ("object with property having schema true is valid", {"foo": 1}, True),
            ("object with property having schema false is invalid", {"bar": 2}, False),
            ("object with both properties is invalid", {"foo": 1, "bar": 2}, False),
            ("empty object is valid", {}, True),
        ],
    ),
    (
        "dependent subschema incompatible with root",
        {
            "properties": {"foo": {}},
            "dependentSchemas": {"foo": {"properties": {"bar": {}}, "additionalProperties": False}},
        },
        [
            ("matches root", {"foo": 1}, False),
            ("matches dependency", {"bar": 1}, True),
            ("matches both", {"foo": 1, "bar": 2}, False),
            ("no dependency", {"baz": 1}, True),
        ],
    ),
]

COMBINATORS = [
    (
        "allOf",
        {
            "allOf": [
                {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                {"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
            ]
        },
        [
            ("allOf", {"foo": "baz", "bar": 2}, True),
            ("mismatch second", {"foo": "baz"}, False),
            ("mismatch first", {"bar": 2}, False),
            ("wrong type", {"foo": "baz", "bar": "quux"}, False),
        ],
    ),
    (
        "allOf with base schema",
        {
            "properties": {"bar": {"type": "integer"}},
            "required": ["bar"],
            "allOf": [
                {"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
                {"properties": {"baz": {"type": "null"}}, "required": ["baz"]},
            ],
        },
        [
            ("valid", {"foo": "quux", "bar": 2, "baz": None}, True),
            ("mismatch base schema", {"foo": "quux", "baz": None}, False),
            ("mismatch first allOf", {"bar": 2, "baz": None}, False),
            ("mismatch second allOf", {"foo": "quux", "bar": 2}, False),
            ("mismatch both", {"bar": 2}, False),
        ],
    ),
    (
        "allOf simple types",
        {"allOf": [{"maximum": 30}, {"minimum": 20}]},
        [
            ("valid", 25, True),
            ("mismatch one", 35, False),
        ],
    ),
    (
        "allOf with boolean schemas, all true",
        {"allOf": [True, True]},
        [("any value is valid", "foo", True)],
    ),
    (
        "allOf with boolean schemas, some false",
        {"allOf": [True, False]},
        [("any value is invalid", "foo", False)],
    ),
    (
        "allOf with boolean schemas, all false",
        {"allOf": [False, False]},
        [("any value is invalid", "foo", False)],
    ),
    (
        "allOf with one empty schema",
        {"allOf": [{}]},
        [("any data is valid", 1, True)],
    ),
    (
        "allOf with two empty schemas",
        {"allOf": [{}, {}]},
        [("any data is valid", 1, True)],
    ),
    (
        "allOf with the first empty schema",
        {"allOf": [{}, {"type": "number"}]},
        [
            ("number is valid", 1, True),
            ("string is invalid", "foo", False),
        ],
    ),
    (
        "allOf with the last empty schema",
        {"allOf": [{"type": "number"}, {}]},
        [
            ("number is valid", 1, True),
            ("string is invalid", "foo", False),
        ],
    ),
    (
        "nested allOf, to check validation semantics",
        {"allOf": [{"allOf": [{"type": "null"}]}]},
        [
            ("null is valid", None, True),
            ("anything non-null is invalid", 123, False),
        ],
    ),
    (
        "allOf combined with anyOf, oneOf",
        {"allOf": [{"multipleOf": 2}], "anyOf": [{"multipleOf": 3}], "oneOf": [{"multipleOf": 5}]},
        [
            ("allOf: false, anyOf: false, oneOf: false", 1, False),
            ("allOf: false, anyOf: false, oneOf: true", 5, False),
            ("allOf: false, anyOf: true, oneOf: false", 3, False),
            ("allOf: false, anyOf: true, oneOf: true", 15, False),
            ("allOf: true, anyOf: false, oneOf: false", 2, False),
            ("allOf: true, anyOf: false, oneOf: true", 10, False),
            ("allOf: true, anyOf: true, oneOf: false", 6, False),
            ("allOf: true, anyOf: true, oneOf: true", 30, True),
        ],
    ),
    (
        "anyOf",
        {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
        [
            ("first anyOf valid", 1, True),
            ("second anyOf valid", 2.5, True),
            ("both anyOf valid", 3, True),
            ("neither anyOf valid", 1.5, False),
        ],
    ),
    (
        "anyOf with base schema",
        {"type": "string", "anyOf": [{"maxLength": 2}, {"minLength": 4}]},
        [
            ("mismatch base schema", 3, False),
            ("one anyOf valid", "foobar", True),
            ("both anyOf invalid", "foo", False),
        ],
    ),
    (
        "anyOf with boolean schemas, all true",
        {"anyOf": [True, True]},
        [("any value is valid", "foo", True)],
    ),
    (
        "anyOf with boolean schemas, some true",
        {"anyOf": [True, False]},
        [("any value is valid", "foo", True)],
    ),
    (
        "anyOf with boolean schemas, all false",
        {"anyOf": [False, False]},
        [("any value is invalid", "foo", False)],
    ),
    (
        "anyOf complex types",
        {
            "anyOf": [
                {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                {"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
            ]
        },
        [
            ("first anyOf valid (complex)", {"bar": 2}, True),
            ("second anyOf valid (complex)", {"foo": "baz"}, True),
            ("both anyOf valid (complex)", {"foo": "baz", "bar": 2}, True),
            ("neither anyOf valid (complex)", {"foo": 2, "bar": "quux"}, False),
        ],
    ),
    (
        "anyOf with one empty schema",
        {"anyOf": [{"type": "number"}, {}]},
        [
            ("string is valid", "foo", True),
            ("number is valid", 123, True),
        ],
    ),
    (
        "nested anyOf, to check validation semantics",
        {"anyOf": [{"anyOf": [{"type": "null"}]}]},
        [
            ("null is valid", None, True),
            ("anything non-null is invalid", 123, False),
        ],
    ),
    (
        "oneOf",
        {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
        [
            ("first oneOf valid", 1, True),
            ("second oneOf valid", 2.5, True),
            ("both oneOf valid", 3, False),
            ("neither oneOf valid", 1.5, False),
        ],
    ),
    (
        "oneOf with base schema",
        {"type": "string", "oneOf": [{"minLength": 2}, {"maxLength": 4}]},
        [
            ("mismatch base schema", 3, False),
            ("one oneOf valid", "foobar", True),
            ("both oneOf valid", "foo", False),
        ],
    ),
    (
        "oneOf with boolean schemas, all true",
        {"oneOf": [True, True]},
        [("any value is invalid", "foo", False)],
    ),
    (
        "oneOf with boolean schemas, one true",
        {"oneOf": [True, False]},
        [("any value is valid", "foo", True)],
    ),
    (
        "oneOf with boolean schemas, more than one true",
        {"oneOf": [True, True, False]},
        [("any value is invalid", "foo", False)],
    ),
    (
        "oneOf with boolean schemas, all false",
        {"oneOf": [False, False]},
        [("any value is invalid", "foo", False)],
    ),
    (
        "oneOf complex types",
        {
            "oneOf": [
                {"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                {"properties": {"foo": {"type": "string"}}, "required": ["foo"]},
            ]
        },
        [
            ("first oneOf valid (complex)", {"bar": 2}, True),
            ("second oneOf valid (complex)", {"foo": "baz"}, True),
            ("both oneOf valid (complex)", {"foo": "baz", "bar": 2}, False),
            ("neither oneOf valid (complex)", {"foo": 2, "bar": "quux"}, False),
        ],
    ),
    (
        "oneOf with empty schema",
        {"oneOf": [{"type": "number"}, {}]},
        [
            ("one valid - valid", "foo", True),
            ("both valid - invalid", 123, False),
        ],
    ),
    (
        "oneOf with required",
        {
            "type": "object",
            "oneOf": [{"required": ["foo", "bar"]}, {"required": ["foo", "baz"]}],
        },
        [
            ("both invalid - invalid", {"bar": 2}, False),
            ("first valid - valid", {"foo": 1, "bar": 2}, True),
            ("second valid - valid", {"foo": 1, "baz": 3}, True),
            ("both valid - invalid", {"foo": 1, "bar": 2, "baz": 3}, False),
        ],
    ),
    (
        "oneOf with missing optional property",
        {
            "oneOf": [
                {"properties": {"bar": {}, "baz": {}}, "required": ["bar"]},
                {"properties": {"foo": {}}, "required": ["foo"]},
            ]
        },
        [
            ("first oneOf valid", {"bar": 8}, True),
            ("second oneOf valid", {"foo": "foo"}, True),
            ("both oneOf valid", {"foo": "foo", "bar": 8}, False),
            ("neither oneOf valid", {"baz": "quux"}, False),
        ],
    ),
    (
        "not",
        {"not": {"type": "integer"}},
        [
            ("allowed", "foo", True),
            ("disallowed", 1, False),
        ],
    ),
    (
        "not multiple types",
        {"not": {"type": ["integer", "boolean"]}},
        [
            ("valid", "foo", True),
            ("mismatch", 1, False),
            ("other mismatch", True, False),
        ],
    ),
    (
        "not more complex schema",
        {"not": {"type": "object", "properties": {"foo": {"type": "string"}}}},
        [
            ("match", 1, True),
            ("other match", {"foo": 1}, True),
            ("mismatch", {"foo": "bar"}, False),
        ],
    ),
    (
        "forbidden property",
        {"properties": {"foo": {"not": {}}}},
        [
            ("property present", {"foo": 1, "bar": 2}, False),
            ("property absent", {"bar": 1, "baz": 2}, True),
        ],
    ),
    (
        "forbid everything with empty schema",
        {"not": {}},
        [
            ("number is invalid", 1, False),
            ("string is invalid", "foo", False),
            ("boolean true is invalid", True, False),
            ("boolean false is invalid", False, False),
            ("null is invalid", None, False),
            ("object is invalid", {"foo": "bar"}, False),
            ("empty object is invalid", {}, False),
            ("array is invalid", ["foo"], False),
            ("empty array is invalid", [], False),
        ],
    ),
    (
        "forbid everything with boolean schema true",
        {"not": True},
        [("any value is invalid", "foo", False)],
    ),
    (
        "allow everything with boolean schema false",
        {"not": False},
        [("any value is valid", "foo", True)],
    ),
    (
        "double negation",
        {"not": {"not": {}}},
        [("any value is valid", "foo", True)],
    ),
]

CONDITIONALS = [
    (
        "ignore if without then or else",
        {"if": {"const": 0}},
        [
            ("valid when valid against lone if", 0, True),
            ("valid when invalid against lone if", "hello", True),
        ],
    ),
    (
        "ignore then without if",
        {"then": {"const": 0}},
        [
            ("valid when valid against lone then", 0, True),
            ("valid when invalid against lone then", "hello", True),
        ],
    ),
    (
        "ignore else without if",
        {"else": {"const": 0}},
        [
            ("valid when valid against lone else", 0, True),
            ("valid when invalid against lone else", "hello", True),
        ],
    ),
    (
        "if and then without else",
        {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
        [
            ("valid through then", -1, True),
            ("invalid through then", -100, False),
            ("valid when if test fails", 3, True),
        ],
    ),
    (
        "if and else without then",
        {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
        [
            ("valid when if test passes", -1, True),
            ("valid through else", 4, True),
            ("invalid through else", 3, False),
        ],
    ),
    (
        "validate against correct branch, then vs else",
        {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}, "else": {"multipleOf": 2}},
        [
            ("valid through then", -1, True),
            ("invalid through then", -100, False),
            ("valid through else", 4, True),
            ("invalid through else", 3, False),
        ],
    ),
    (
        "non-interference across combined schemas",
        {
            "allOf": [
                {"if": {"exclusiveMaximum": 0}},
                {"then": {"minimum": -10}},
                {"else": {"multipleOf": 2}},
            ]
        },
        [
            ("valid, but would have been invalid through then", -100, True),
            ("valid, but would have been invalid through else", 3, True),
        ],
    ),
    (
        "if with boolean schema true",
        {"if": True, "then": {"const": "then"}, "else": {"const": "else"}},
        [
            ("boolean schema true in if always chooses the then path (valid)", "then", True),
            ("boolean schema true in if always chooses the then path (invalid)", "else", False),
        ],
    ),
    (
        "if with boolean schema false",
        {"if": False, "then": {"const": "then"}, "else": {"const": "else"}},
        [
            ("boolean schema false in if always chooses the else path (invalid)", "then", False),
            ("boolean schema false in if always chooses the else path (valid)", "else", True),
        ],
    ),
    (
        "if appears at the end when serialized (keyword processing sequence)",
        {"then": {"const": "yes"}, "else": {"const": "other"}, "if": {"maxLength": 4}},
        [
            ("yes redirects to then and passes", "yes", True),
            ("other redirects to else and passes", "other", True),
            ("no redirects to then and fails", "no", False),
            ("invalid redirects to else and fails", "invalid", False),
        ],
    ),
]

ITEMS = [
    (
        "a schema given for items",
        {"items": {"type": "integer"}},
        [
            ("valid items", [1, 2, 3], True),
            ("wrong type of items", [1, "x"], False),
            ("ignores non-arrays", {"foo": "bar"}, True),
        ],
    ),
    (
        "items with boolean schema (true)",
        {"items": True},
        [
            ("any array is valid", [1, 2, 3], True),
            ("empty array is valid", [], True),
        ],
    ),
    (
        "items with boolean schema (false)",
        {"items": False},
        [
            ("any non-empty array is invalid", [1, 2, 3], False),
            ("empty array is valid", [], True),
        ],
    ),
    (
        "items and subitems",
        {
            "$defs": {
                "item": {
                    "type": "array",
                    "items": False,
                    "prefixItems": [{"$ref": "#/$defs/sub-item"}, {"$ref": "#/$defs/sub-item"}],
                },
                "sub-item": {"type": "object", "required": ["foo"]},
            },
            "type": "array",
            "items": False,
            "prefixItems": [
                {"$ref": "#/$defs/item"},
                {"$ref": "#/$defs/item"},
                {"$ref": "#/$defs/item"},
            ],
        },
        [
            (
                "valid items",
                [
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                ],
                True,
            ),
            (
                "too many items",
                [
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                ],
                False,
            ),
            (
                "too many sub-items",
                [
                    [{"foo": None}, {"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                ],
                False,
            ),
            (
                "wrong item",
                [
                    {"foo": None},
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                ],
                False,
            ),
            (
                "wrong sub-item",
                [
                    [{}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                    [{"foo": None}, {"foo": None}],
                ],
                False,
            ),
            (
                "fewer items is valid",
                [
                    [{"foo": None}],
                    [{"foo": None}],
                ],
                True,
            ),
        ],
    ),
    (
        "nested items",
        {
            "type": "array",
            "items": {
                "type": "array",
                "items": {
                    "type": "array",
                    "items": {"type": "array", "items": {"type": "number"}},
                },
            },
        },
        [
            ("valid nested array", [[[[1]], [[2], [3]]], [[[4], [5], [6]]]], True),
            ("nested array with invalid type", [[[["1"]], [[2], [3]]], [[[4], [5], [6]]]], False),
            ("not deep enough", [[[1], [2], [3]], [[4], [5], [6]]], False),
        ],
    ),
    (
        "prefixItems with no additional items allowed",
        {"prefixItems": [{}, {}, {}], "items": False},
        [
            ("empty array", [], True),
            ("fewer number of items present (1)", [1], True),
            ("fewer number of items present (2)", [1, 2], True),
            ("equal number of items present", [1, 2, 3], True),
            ("additional items are not permitted", [1, 2, 3, 4], False),
        ],
    ),
    (
        "items does not look in applicators, valid case",
        {"allOf": [{"prefixItems": [{"minimum": 3}]}], "items": {"minimum": 5}},
        [
            ("prefixItems in allOf does not constrain items, invalid case", [3, 5], False),
            ("prefixItems in allOf does not constrain items, valid case", [5, 5], True),
        ],
    ),
    (
        "items with null instance elements",
        {"items": {"type": "null"}},
        [
            ("allows null elements", [None], True),
        ],
    ),
    (
        "prefixItems validation adjusts the starting index for items",
        {"prefixItems": [{"type": "string"}], "items": {"type": "integer"}},
        [
            ("valid items", ["x", 2, 3], True),
            ("wrong type of second item", ["x", "y"], False),
        ],
    ),
]

PREFIX_ITEMS = [
    (
        "a schema given for prefixItems",
        {"prefixItems": [{"type": "integer"}, {"type": "string"}]},
        [
            ("correct types", [1, "foo"], True),
            ("wrong types", ["foo", 1], False),
            ("incomplete array of items", [1], True),
            ("array with additional items", [1, "foo", True], True),
            ("empty array", [], True),
        ],
    ),
    (
        "prefixItems with boolean schemas",
        {"prefixItems": [True, False]},
        [
            ("array with one item is valid", [1], True),
            ("array with two items is invalid", [1, "foo"], False),
            ("empty array is valid", [], True),
        ],
    ),
    (
        "additional items are allowed by default",
        {"prefixItems": [{"type": "integer"}]},
        [
            ("only the first item is validated", [1, "foo", False], True),
            ("first item is validated (invalid)", ["foo"], False),
        ],
    ),
    (
        "prefixItems with null instance elements",
        {"prefixItems": [{"type": "null"}]},
        [
            ("allows null elements", [None], True),
        ],
    ),
]

CONTAINS = [
    (
        "contains keyword validation",
        {"contains": {"minimum": 5}},
        [
            ("array with item matching schema (5) is valid", [3, 4, 5], True),
            ("array with item matching schema (6) is valid", [3, 4, 6], True),
            ("array with two items matching schema (5, 6) is valid", [3, 4, 5, 6], True),
            ("array without items matching schema is invalid", [2, 3, 4], False),
            ("empty array is invalid", [], False),
            ("not array is valid", {}, True),
        ],
    ),
    (
        "contains keyword with const keyword",
        {"contains": {"const": 5}},
        [
            ("array with item 5 is valid", [3, 4, 5], True),
            ("array with two items 5 is valid", [3, 4, 5, 5], True),
            ("array without item 5 is invalid", [1, 2, 3, 4], False),
        ],
    ),
    (
        "contains keyword with boolean schema true",
        {"contains": True},
        [
            ("any non-empty array is valid", ["foo"], True),
            ("empty array is invalid", [], False),
        ],
    ),
    (
        "contains keyword with boolean schema false",
        {"contains": False},
        [
            ("any non-empty array is invalid", ["foo"], False),
            ("empty array is invalid", [], False),
        ],
    ),
    (
        "items + contains",
        {"items": {"multipleOf": 2}, "contains": {"multipleOf": 3}},
        [
            ("matches items, does not match contains", [2, 4, 8], False),
            ("does not match items, matches contains", [3, 6, 9], False),
            ("matches both items and contains", [6, 12], True),
            ("matches neither items nor contains", [1, 5], False),
        ],
    ),
    (
        "contains with null instance elements",
        {"contains": {"type": "null"}},
        [
            ("allows null items", [None], True),
        ],
    ),
    (
        "maxContains without contains is ignored",
        {"maxContains": 1},
        [
            ("one item valid against lone maxContains", [1], True),
            ("two items still valid against lone maxContains", [1, 2], True),
        ],
    ),
    (
        "maxContains with contains",
        {"contains": {"const": 1}, "maxContains": 1},
        [
            ("empty data", [], False),
            ("all elements match, valid maxContains", [1], True),
            ("all elements match, invalid maxContains", [1, 1], False),
            ("some elements match, valid maxContains", [1, 2], True),
            ("some elements match, invalid maxContains", [1, 2, 1], False),
        ],
    ),
    (
        "maxContains with contains, value with a decimal",
        {"contains": {"const": 1}, "maxContains": 1.0},
        [
            ("one element matches, valid maxContains", [1], True),
            ("too many elements match, invalid maxContains", [1, 1], False),
        ],
    ),
    (
        "minContains without contains is ignored",
        {"minContains": 1},
        [
            ("one item valid against lone minContains", [1], True),
            ("zero items still valid against lone minContains", [], True),
        ],
    ),
    (
        "minContains=1 with contains",
        {"contains": {"const": 1}, "minContains": 1},
        [
            ("empty data", [], False),
            ("no elements match", [2], False),
            ("single element matches, valid minContains", [1], True),
            ("some elements match, valid minContains", [1, 2], True),
            ("all elements match, valid minContains", [1, 1], True),
        ],
    ),
    (
        "minContains=2 with contains",
        {"contains": {"const": 1}, "minContains": 2},
        [
            ("empty data", [], False),
            ("all elements match, invalid minContains", [1], False),
            ("some elements match, invalid minContains", [1, 2], False),
            ("all elements match, valid minContains (exactly as needed)", [1, 1], True),
            ("all elements match, valid minContains (more than needed)", [1, 1, 1], True),
            ("some elements match, valid minContains", [1, 2, 1], True),
        ],
    ),
    (
        "maxContains = minContains",
        {"contains": {"const": 1}, "maxContains": 2, "minContains": 2},
        [
            ("empty data", [], False),
            ("all elements match, invalid minContains", [1], False),
            ("all elements match, invalid maxContains", [1, 1, 1], False),
            ("all elements match, valid maxContains and minContains", [1, 1], True),
        ],
    ),
    (
        "maxContains < minContains",
        {"contains": {"const": 1}, "maxContains": 1, "minContains": 3},
        [
            ("empty data", [], False),
            ("invalid minContains", [1], False),
            ("invalid maxContains", [1, 1, 1], False),
            ("invalid maxContains and minContains", [1, 1], False),
        ],
    ),
    (
        "minContains = 0 with no maxContains",
        {"contains": {"const": 1}, "minContains": 0},
        [
            ("empty data", [], True),
            ("minContains = 0 makes contains always pass", [2], True),
        ],
    ),
    (
        "minContains = 0 with maxContains",
        {"contains": {"const": 1}, "minContains": 0, "maxContains": 1},
        [
            ("empty data", [], True),
            ("not more than maxContains", [1], True),
            ("too many", [1, 1], False),
        ],
    ),
]

REFS = [
    (
        "root pointer ref",
        {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False},
        [
            ("match", {"foo": False}, True),
            ("recursive match", {"foo": {"foo": False}}, True),
            ("mismatch", {"bar": False}, False),
            ("recursive mismatch", {"foo": {"bar": False}}, False),
        ],
    ),
    (
        "relative pointer ref to object",
        {"properties": {"foo": {"type": "integer"}, "bar": {"$ref": "#/properties/foo"}}},
        [
            ("match", {"bar": 3}, True),
            ("mismatch", {"bar": True}, False),
        ],
    ),
    (
        "relative pointer ref to array",
        {"prefixItems": [{"type": "integer"}, {"$ref": "#/prefixItems/0"}]},
        [
            ("match array", [1, 2], True),
            ("mismatch array", [1, "foo"], False),
        ],
    ),
    (
        "escaped pointer ref",
        {
            "$defs": {
                "tilde~field": {"type": "integer"},
                "slash/field": {"type": "integer"},
                "percent%field": {"type": "integer"},
            },
            "properties": {
                "tilde": {"$ref": "#/$defs/tilde~0field"},
                "slash": {"$ref": "#/$defs/slash~1field"},
                "percent": {"$ref": "#/$defs/percent%25field"},
            },
        },
        [
            ("slash invalid", {"slash": "aoeu"}, False),
            ("tilde invalid", {"tilde": "aoeu"}, False),
            ("percent invalid", {"percent": "aoeu"}, False),
            ("slash valid", {"slash": 123}, True),
            ("tilde valid", {"tilde": 123}, True),
            ("percent valid", {"percent": 123}, True),
        ],
    ),
    (
        "nested refs",
        {
            "$defs": {
                "a": {"type": "integer"},
                "b": {"$ref": "#/$defs/a"},
                "c": {"$ref": "#/$defs/b"},
            },
            "$ref": "#/$defs/c",
        },
        [
            ("nested ref valid", 5, True),
            ("nested ref invalid", "a", False),
        ],
    ),
    (
        "ref applies alongside sibling keywords",
        {"$defs": {"reffed": {"type": "array"}}, "properties": {"foo": {"$ref": "#/$defs/reffed", "maxItems": 2}}},
        [
            ("ref valid, maxItems valid", {"foo": []}, True),
            ("ref valid, maxItems invalid", {"foo": [1, 2, 3]}, False),
            ("ref invalid", {"foo": "string"}, False),
        ],
    ),
    (
        "property named $ref that is not a reference",
        {"properties": {"$ref": {"type": "string"}}},
        [
            ("property named $ref valid", {"$ref": "a"}, True),
            ("property named $ref invalid", {"$ref": 2}, False),
        ],
    ),
    (
        "property named $ref, containing an actual $ref",
        {
            "properties": {"$ref": {"$ref": "#/$defs/is-string"}},
            "$defs": {"is-string": {"type": "string"}},
        },
        [
            ("property named $ref valid", {"$ref": "a"}, True),
            ("property named $ref invalid", {"$ref": 2}, False),
        ],
    ),
    (
        "$ref to boolean schema true",
        {"$ref": "#/$defs/bool", "$defs": {"bool": True}},
        [("any value is valid", "foo", True)],
    ),
    (
        "$ref to boolean schema false",
        {"$ref": "#/$defs/bool", "$defs": {"bool": False}},
        [("any value is invalid", "foo", False)],
    ),
    (
        "refs with quote",
        {"properties": {"foo\"bar": {"$ref": "#/$defs/foo%22bar"}}, "$defs": {"foo\"bar": {"type": "number"}}},
        [
            ("object with numbers is valid", {"foo\"bar": 1}, True),
            ("object with strings is invalid", {"foo\"bar": "1"}, False),
        ],
    ),
    (
        "ref creates a dynamic scope for a nested $id",
        {
            "$id": "https://example.test/root.json",
            "$ref": "intermediate",
            "$defs": {
                "intermediate": {
                    "$id": "intermediate",
                    "$ref": "leaf",
                },
                "leaf": {
                    "$id": "https://example.test/leaf",
                    "type": "integer",
                },
            },
        },
        [
            ("integer valid", 4, True),
            ("string invalid", "x", False),
        ],
    ),
    (
        "naive replacement of $ref with its destination is not correct",
        {
            "$defs": {"a_string": {"type": "string"}},
            "enum": [{"$ref": "#/$defs/a_string"}],
        },
        [
            ("do not evaluate the $ref inside the enum, matching any string", "this is a string", False),
            ("match the enum exactly", {"$ref": "#/$defs/a_string"}, True),
        ],
    ),
    (
        "simple anchor ref",
        {
            "$defs": {"anchored": {"$anchor": "foo", "type": "integer"}},
            "$ref": "#foo",
        },
        [
            ("match", 1, True),
            ("mismatch", "a", False),
        ],
    ),
    (
        "anchor within nested resource",
        {
            "$id": "https://example.test/anchors-root",
            "$defs": {
                "inner": {
                    "$id": "nested.json",
                    "$defs": {"x": {"$anchor": "my_anchor", "type": "string"}},
                }
            },
            "$ref": "nested.json#my_anchor",
        },
        [
            ("string matches", "a", True),
            ("integer does not", 1, False),
        ],
    ),
    (
        "defs: validate definition against metaschema usage",
        {"$defs": {"foo": {"type": "integer"}}, "$ref": "#/$defs/foo"},
        [
            ("integer is valid", 42, True),
            ("string is invalid", "x", False),
        ],
    ),
]

DYNAMIC_REF = [
    (
        "A $dynamicRef to a $dynamicAnchor in the same schema resource behaves like a normal $ref to an $anchor",
        {
            "$id": "https://test.json-schema.org/dynamicRef-dynamicAnchor-same-schema/root",
            "type": "array",
            "items": {"$dynamicRef": "#items"},
            "$defs": {"foo": {"$dynamicAnchor": "items", "type": "string"}},
        },
        [
            ("An array of strings is valid", ["foo", "bar"], True),
            ("An array containing non-strings is invalid", [1, 2], False),
        ],
    ),
    (
        "A $ref to a $dynamicAnchor in the same schema resource behaves like a normal $ref to an $anchor",
        {
            "$id": "https://test.json-schema.org/ref-dynamicAnchor-same-schema/root",
            "type": "array",
            "items": {"$ref": "#items"},
            "$defs": {"foo": {"$dynamicAnchor": "items", "type": "string"}},
        },
        [
            ("An array of strings is valid", ["foo", "bar"], True),
            ("An array containing non-strings is invalid", [1, 2], False),
        ],
    ),
    (
        "A $dynamicRef resolves to the first $dynamicAnchor still in scope that is encountered when the schema is evaluated",
        {
            "$id": "https://test.json-schema.org/typical-dynamic-resolution/root",
            "$ref": "list",
            "$defs": {
                "foo": {"$dynamicAnchor": "items", "type": "string"},
                "list": {
                    "$id": "list",
                    "type": "array",
                    "items": {"$dynamicRef": "#items"},
                    "$defs": {"items": {"$comment": "This is only needed to satisfy bookending", "$dynamicAnchor": "items"}},
                },
            },
        },
        [
            ("An array of strings is valid", ["foo", "bar"], True),
            ("An array containing non-strings is invalid", [1, 2], False),
        ],
    ),
    (
        "A $dynamicRef without a matching $dynamicAnchor in the same schema resource behaves like a normal $ref to $anchor",
        {
            "$id": "https://test.json-schema.org/dynamicRef-without-anchor/root",
            "$ref": "list",
            "$defs": {
                "foo": {"$dynamicAnchor": "items", "type": "string"},
                "list": {
                    "$id": "list",
                    "type": "array",
                    "items": {"$dynamicRef": "#items"},
                    "$defs": {"items": {"$comment": "This is only needed to give the reference somewhere to resolve to when it behaves like $ref", "$anchor": "items", "type": "number"}},
                },
            },
        },
        [
            ("An array with a string is invalid (plain-$ref semantics assert number)", ["foo", 42], False),
            ("An array of integers is valid", [24, 42], True),
        ],
    ),
    (
        "An $anchor with the same name as a $dynamicAnchor is not used for dynamic resolution",
        {
            "$id": "https://test.json-schema.org/dynamic-resolution-ignores-anchors/root",
            "$ref": "list",
            "$defs": {
                "foo": {"$anchor": "items", "type": "string"},
                "list": {
                    "$id": "list",
                    "type": "array",
                    "items": {"$dynamicRef": "#items"},
                    "$defs": {"items": {"$comment": "This is only needed to satisfy bookending", "$dynamicAnchor": "items"}},
                },
            },
        },
        [
            ("Any array is valid", ["foo", 42], True),
        ],
    ),
    (
        "multiple dynamic paths to the $dynamicRef keyword (strict-tree)",
        {
            "$id": "https://test.json-schema.org/strict-tree/base",
            "$dynamicAnchor": "node",
            "$ref": "tree",
            "unevaluatedProperties": False,
            "$defs": {
                "tree": {
                    "$id": "tree",
                    "$dynamicAnchor": "node",
                    "type": "object",
                    "properties": {
                        "data": True,
                        "children": {"type": "array", "items": {"$dynamicRef": "#node"}},
                    },
                }
            },
        },
        [
            (
                "instance with misspelled field invalid",
                {"children": [{"daat": 1}]},
                False,
            ),
            (
                "instance with correct field valid",
                {"children": [{"data": 1}]},
                True,
            ),
        ],
    ),
]

UNEVALUATED_PROPS = [
    (
        "unevaluatedProperties true",
        {"type": "object", "unevaluatedProperties": True},
        [
            ("with no unevaluated properties", {}, True),
            ("with unevaluated properties", {"foo": "foo"}, True),
        ],
    ),
    (
        "unevaluatedProperties schema",
        {"type": "object", "unevaluatedProperties": {"type": "string", "minLength": 3}},
        [
            ("with no unevaluated properties", {}, True),
            ("with valid unevaluated properties", {"foo": "foo"}, True),
            ("with invalid unevaluated properties", {"foo": "fo"}, False),
        ],
    ),
    (
        "unevaluatedProperties false",
        {"type": "object", "unevaluatedProperties": False},
        [
            ("with no unevaluated properties", {}, True),
            ("with unevaluated properties", {"foo": "foo"}, False),
        ],
    ),
    (
        "unevaluatedProperties with adjacent properties",
        {"type": "object", "properties": {"foo": {"type": "string"}}, "unevaluatedProperties": False},
        [
            ("with no unevaluated properties", {"foo": "foo"}, True),
            ("with unevaluated properties", {"foo": "foo", "bar": "bar"}, False),
        ],
    ),
    (
        "unevaluatedProperties with adjacent patternProperties",
        {"type": "object", "patternProperties": {"^foo": {"type": "string"}}, "unevaluatedProperties": False},
        [
            ("with no unevaluated properties", {"foo": "foo"}, True),
            ("with unevaluated properties", {"foo": "foo", "bar": "bar"}, False),
        ],
    ),
    (
        "unevaluatedProperties with adjacent additionalProperties",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "additionalProperties": True,
            "unevaluatedProperties": False,
        },
        [
            ("with no additional properties", {"foo": "foo"}, True),
            ("with additional properties", {"foo": "foo", "bar": "bar"}, True),
        ],
    ),
    (
        "unevaluatedProperties with nested properties",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "allOf": [{"properties": {"bar": {"type": "string"}}}],
            "unevaluatedProperties": False,
        },
        [
            ("with no additional properties", {"foo": "foo", "bar": "bar"}, True),
            ("with additional properties", {"foo": "foo", "bar": "bar", "baz": "baz"}, False),
        ],
    ),
    (
        "unevaluatedProperties with nested patternProperties",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "allOf": [{"patternProperties": {"^bar": {"type": "string"}}}],
            "unevaluatedProperties": False,
        },
        [
            ("with no additional properties", {"foo": "foo", "bar": "bar"}, True),
            ("with additional properties", {"foo": "foo", "bar": "bar", "baz": "baz"}, False),
        ],
    ),
    (
        "unevaluatedProperties with nested additionalProperties",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "allOf": [{"additionalProperties": True}],
            "unevaluatedProperties": False,
        },
        [
            ("with no additional properties", {"foo": "foo"}, True),
            ("with additional properties", {"foo": "foo", "bar": "bar"}, True),
        ],
    ),
    (
        "unevaluatedProperties with nested unevaluatedProperties",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "allOf": [{"unevaluatedProperties": True}],
            "unevaluatedProperties": {"type": "string", "maxLength": 2},
        },
        [
            ("with no nested unevaluated properties", {"foo": "foo"}, True),
            ("with nested unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
        ],
    ),
    (
        "unevaluatedProperties with anyOf",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "anyOf": [
                {"properties": {"bar": {"const": "bar"}}, "required": ["bar"]},
                {"properties": {"baz": {"const": "baz"}}, "required": ["baz"]},
                {"properties": {"quux": {"const": "quux"}}, "required": ["quux"]},
            ],
            "unevaluatedProperties": False,
        },
        [
            ("when one matches and has no unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
            ("when one matches and has unevaluated properties", {"foo": "foo", "bar": "bar", "baz": "not-baz"}, False),
            ("when two match and has no unevaluated properties", {"foo": "foo", "bar": "bar", "baz": "baz"}, True),
            ("when two match and has unevaluated properties", {"foo": "foo", "bar": "bar", "baz": "baz", "quux": "not-quux"}, False),
        ],
    ),
    (
        "unevaluatedProperties with oneOf",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "oneOf": [
                {"properties": {"bar": {"const": "bar"}}, "required": ["bar"]},
                {"properties": {"baz": {"const": "baz"}}, "required": ["baz"]},
            ],
            "unevaluatedProperties": False,
        },
        [
            ("with no unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
            ("with unevaluated properties", {"foo": "foo", "bar": "bar", "quux": "quux"}, False),
        ],
    ),
    (
        "unevaluatedProperties with not",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "not": {"not": {"properties": {"bar": {"const": "bar"}}, "required": ["bar"]}},
            "unevaluatedProperties": False,
        },
        [
            ("with unevaluated properties", {"foo": "foo", "bar": "bar"}, False),
        ],
    ),
    (
        "unevaluatedProperties with if/then/else",
        {
            "type": "object",
            "if": {"properties": {"foo": {"const": "then"}}, "required": ["foo"]},
            "then": {"properties": {"bar": {"type": "string"}}, "required": ["bar"]},
            "else": {"properties": {"baz": {"type": "string"}}, "required": ["baz"]},
            "unevaluatedProperties": False,
        },
        [
            ("when if is true and has no unevaluated properties", {"foo": "then", "bar": "bar"}, True),
            ("when if is true and has unevaluated properties", {"foo": "then", "bar": "bar", "baz": "baz"}, False),
            ("when if is false and has no unevaluated properties", {"baz": "baz"}, True),
            ("when if is false and has unevaluated properties", {"foo": "else", "baz": "baz"}, False),
        ],
    ),
    (
        "unevaluatedProperties with if/then/else, then not defined",
        {
            "type": "object",
            "if": {"properties": {"foo": {"const": "then"}}, "required": ["foo"]},
            "else": {"properties": {"baz": {"type": "string"}}, "required": ["baz"]},
            "unevaluatedProperties": False,
        },
        [
            ("when if is true and has no unevaluated properties", {"foo": "then", "bar": "bar"}, False),
            ("when if is true and has unevaluated properties", {"foo": "then", "bar": "bar", "baz": "baz"}, False),
            ("when if is false and has no unevaluated properties", {"baz": "baz"}, True),
            ("when if is false and has unevaluated properties", {"foo": "else", "baz": "baz"}, False),
        ],
    ),
    (
        "unevaluatedProperties with dependentSchemas",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "dependentSchemas": {"foo": {"properties": {"bar": {"const": "bar"}}, "required": ["bar"]}},
            "unevaluatedProperties": False,
        },
        [
            ("with no unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
            ("with unevaluated properties", {"bar": "bar"}, False),
        ],
    ),
    (
        "unevaluatedProperties with boolean schemas (allOf true)",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "allOf": [True],
            "unevaluatedProperties": False,
        },
        [
            ("with no unevaluated properties", {"foo": "foo"}, True),
            ("with unevaluated properties", {"bar": "bar"}, False),
        ],
    ),
    (
        "unevaluatedProperties with $ref",
        {
            "type": "object",
            "$ref": "#/$defs/bar",
            "properties": {"foo": {"type": "string"}},
            "unevaluatedProperties": False,
            "$defs": {"bar": {"properties": {"bar": {"type": "string"}}}},
        },
        [
            ("with no unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
            ("with unevaluated properties", {"foo": "foo", "bar": "bar", "baz": "baz"}, False),
        ],
    ),
    (
        "unevaluatedProperties can't see inside cousins",
        {
            "allOf": [
                {"properties": {"foo": True}},
                {"unevaluatedProperties": False},
            ]
        },
        [
            ("always fails", {"foo": 1}, False),
        ],
    ),
    (
        "unevaluatedProperties can't see inside cousins (reverse order)",
        {
            "allOf": [
                {"unevaluatedProperties": False},
                {"properties": {"foo": True}},
            ]
        },
        [
            ("always fails", {"foo": 1}, False),
        ],
    ),
    (
        "nested unevaluatedProperties, outer false, inner true, properties outside",
        {
            "type": "object",
            "properties": {"foo": {"type": "string"}},
            "allOf": [{"unevaluatedProperties": True}],
            "unevaluatedProperties": False,
        },
        [
            ("with no nested unevaluated properties", {"foo": "foo"}, True),
            ("with nested unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
        ],
    ),
    (
        "nested unevaluatedProperties, outer false, inner true, properties inside",
        {
            "type": "object",
            "allOf": [{"properties": {"foo": {"type": "string"}}, "unevaluatedProperties": True}],
            "unevaluatedProperties": False,
        },
        [
            ("with no nested unevaluated properties", {"foo": "foo"}, True),
            ("with nested unevaluated properties", {"foo": "foo", "bar": "bar"}, True),
        ],
    ),
    (
        "cousin unevaluatedProperties, true and false, true with properties",
        {
            "type": "object",
            "allOf": [
                {"properties": {"foo": {"type": "string"}}, "unevaluatedProperties": True},
                {"unevaluatedProperties": False},
            ],
        },
        [
            ("with no nested unevaluated properties", {"foo": "foo"}, False),
            ("with nested unevaluated properties", {"foo": "foo", "bar": "bar"}, False),
        ],
    ),
    (
        "property is evaluated in an uncle schema to unevaluatedProperties",
        {
            "type": "object",
            "properties": {
                "foo": {
                    "type": "object",
                    "properties": {"bar": {"type": "string"}},
                    "unevaluatedProperties": False,
                }
            },
            "anyOf": [
                {"properties": {"foo": {"properties": {"faz": {"type": "string"}}}}}
            ],
        },
        [
            ("no extra properties", {"foo": {"bar": "test"}}, True),
            ("uncle keyword evaluation is not significant", {"foo": {"bar": "test", "faz": "test"}}, False),
        ],
    ),
    (
        "dependentSchemas with unevaluatedProperties",
        {
            "properties": {"foo2": {}},
            "dependentSchemas": {"foo": {}, "foo2": {"properties": {"bar": {}}}},
            "unevaluatedProperties": False,
        },
        [
            ("unevaluatedProperties doesn't consider dependentSchemas", {"foo": ""}, False),
            ("unevaluatedProperties sees bar when foo2 is present", {"foo2": "", "bar": ""}, True),
            ("unevaluatedProperties doesn't see bar when foo2 is absent", {"bar": ""}, False),
        ],
    ),
]

UNEVALUATED_ITEMS = [
    (
        "unevaluatedItems true",
        {"type": "array", "unevaluatedItems": True},
        [
            ("with no unevaluated items", [], True),
            ("with unevaluated items", ["foo"], True),
        ],
    ),
    (
        "unevaluatedItems false",
        {"type": "array", "unevaluatedItems": False},
        [
            ("with no unevaluated items", [], True),
            ("with unevaluated items", ["foo"], False),
        ],
    ),
    (
        "unevaluatedItems as schema",
        {"type": "array", "unevaluatedItems": {"type": "string"}},
        [
            ("with no unevaluated items", [], True),
            ("with valid unevaluated items", ["foo"], True),
            ("with invalid unevaluated items", [42], False),
        ],
    ),
    (
        "unevaluatedItems with uniform items",
        {"type": "array", "items": {"type": "string"}, "unevaluatedItems": False},
        [
            ("unevaluatedItems doesn't apply", ["foo", "bar"], True),
        ],
    ),
    (
        "unevaluatedItems with tuple",
        {"type": "array", "prefixItems": [{"type": "string"}], "unevaluatedItems": False},
        [
            ("with no unevaluated items", ["foo"], True),
            ("with unevaluated items", ["foo", "bar"], False),
        ],
    ),
    (
        "unevaluatedItems with items and prefixItems",
        {
            "type": "array",
            "prefixItems": [{"type": "string"}],
            "items": True,
            "unevaluatedItems": False,
        },
        [
            ("unevaluatedItems doesn't apply", ["foo", 42], True),
        ],
    ),
    (
        "unevaluatedItems with nested tuple",
        {
            "type": "array",
            "prefixItems": [{"type": "string"}],
            "allOf": [{"prefixItems": [True, {"type": "number"}]}],
            "unevaluatedItems": False,
        },
        [
            ("with no unevaluated items", ["foo", 42], True),
            ("with unevaluated items", ["foo", 42, True], False),
        ],
    ),
    (
        "unevaluatedItems with anyOf",
        {
            "type": "array",
            "prefixItems": [{"const": "foo"}],
            "anyOf": [
                {"prefixItems": [True, {"const": "bar"}]},
                {"prefixItems": [True, True, {"const": "baz"}]},
            ],
            "unevaluatedItems": False,
        },
        [
            ("when one schema matches and has no unevaluated items", ["foo", "bar"], True),
            ("when one schema matches and has unevaluated items", ["foo", "bar", 42], False),
            ("when two schemas match and has no unevaluated items", ["foo", "bar", "baz"], True),
            ("when two schemas match and has unevaluated items", ["foo", "bar", "baz", 42], False),
        ],
    ),
    (
        "unevaluatedItems with oneOf",
        {
            "type": "array",
            "prefixItems": [{"const": "foo"}],
            "oneOf": [
                {"prefixItems": [True, {"const": "bar"}]},
                {"prefixItems": [True, {"const": "baz"}]},
            ],
            "unevaluatedItems": False,
        },
        [
            ("with no unevaluated items", ["foo", "bar"], True),
            ("with unevaluated items", ["foo", "bar", 42], False),
        ],
    ),
    (
        "unevaluatedItems with not",
        {
            "type": "array",
            "prefixItems": [{"const": "foo"}],
            "not": {"not": {"prefixItems": [True, {"const": "bar"}]}},
            "unevaluatedItems": False,
        },
        [
            ("with unevaluated items", ["foo", "bar"], False),
        ],
    ),
    (
        "unevaluatedItems with if/then/else",
        {
            "type": "array",
            "prefixItems": [{"const": "foo"}],
            "if": {"prefixItems": [True, {"const": "bar"}]},
            "then": {"prefixItems": [True, True, {"const": "then"}]},
            "else": {"prefixItems": [True, True, True, {"const": "else"}]},
            "unevaluatedItems": False,
        },
        [
            ("when if matches and it has no unevaluated items", ["foo", "bar", "then"], True),
            ("when if matches and it has unevaluated items", ["foo", "bar", "then", "else"], False),
            ("when if doesn't match and it has no unevaluated items", ["foo", 42, 42, "else"], True),
            ("when if doesn't match and it has unevaluated items", ["foo", 42, 42, "else", 42], False),
        ],
    ),
    (
        "unevaluatedItems with boolean schemas (allOf true)",
        {"type": "array", "allOf": [True], "unevaluatedItems": False},
        [
            ("with no unevaluated items", [], True),
            ("with unevaluated items", ["foo"], False),
        ],
    ),
    (
        "unevaluatedItems with $ref",
        {
            "type": "array",
            "$ref": "#/$defs/bar",
            "prefixItems": [{"type": "string"}],
            "unevaluatedItems": False,
            "$defs": {"bar": {"prefixItems": [True, {"type": "string"}]}},
        },
        [
            ("with no unevaluated items", ["foo", "bar"], True),
            ("with unevaluated items", ["foo", "bar", "baz"], False),
        ],
    ),
    (
        "unevaluatedItems can't see inside cousins",
        {"allOf": [{"prefixItems": [True]}, {"unevaluatedItems": False}]},
        [
            ("always fails", [1], False),
        ],
    ),
    (
        "item is evaluated in an uncle schema to unevaluatedItems",
        {
            "type": "object",
            "properties": {
                "foo": {
                    "type": "array",
                    "prefixItems": [{"type": "string"}],
                    "unevaluatedItems": False,
                }
            },
            "anyOf": [
                {"properties": {"foo": {"prefixItems": [True, {"type": "string"}]}}}
            ],
        },
        [
            ("no extra items", {"foo": ["test"]}, True),
            ("uncle keyword evaluation is not significant", {"foo": ["test", "test"]}, False),
        ],
    ),
    (
        "unevaluatedItems depends on adjacent contains",
        {"prefixItems": [True], "contains": {"type": "string"}, "unevaluatedItems": False},
        [
            ("second item is evaluated by contains", [1, "foo"], True),
            ("contains fails, second item is not evaluated", [1, 2], False),
            ("contains passes, second item is not evaluated", [1, 2, "foo"], False),
        ],
    ),
    (
        "unevaluatedItems depends on multiple nested contains",
        {
            "allOf": [
                {"contains": {"multipleOf": 2}},
                {"contains": {"multipleOf": 3}},
            ],
            "unevaluatedItems": {"multipleOf": 5},
        },
        [
            ("5 not evaluated, passes unevaluatedItems", [2, 3, 4, 5, 6], True),
            ("7 not evaluated, fails unevaluatedItems", [2, 3, 4, 7, 8], False),
        ],
    ),
    (
        "unevaluatedItems and contains interact to control item dependency relationship",
        {
            "if": {"contains": {"const": "a"}},
            "then": {
                "if": {"contains": {"const": "b"}},
                "then": {"if": {"contains": {"const": "c"}}},
            },
            "unevaluatedItems": False,
        },
        [
            ("empty array is valid", [], True),
            ("only a's are valid", ["a", "a"], True),
            ("a's and b's are valid", ["a", "b", "a", "b", "a"], True),
            ("a's, b's and c's are valid", ["c", "a", "c", "c", "b", "a"], True),
            ("only b's are invalid", ["b", "b"], False),
            ("only c's are invalid", ["c", "c"], False),
            ("only b's and c's are invalid", ["c", "b", "c", "b", "c"], False),
            ("only a's and c's are invalid", ["c", "a", "c", "a", "c"], False),
        ],
    ),
]

MISC = [
    (
        "format: email annotates only by default",
        {"format": "email"},
        [
            ("all string formats ignore integers", 12, True),
            ("all string formats ignore floats", 13.7, True),
            ("all string formats ignore objects", {}, True),
            ("all string formats ignore arrays", [], True),
            ("all string formats ignore booleans", False, True),
            ("all string formats ignore nulls", None, True),
            ("invalid email string is only an annotation by default", "2962", True),
        ],
    ),
    (
        "format: ipv4 annotates only by default",
        {"format": "ipv4"},
        [
            ("invalid ipv4 string is only an annotation by default", "127.0.0.0.1", True),
        ],
    ),
    (
        "content: contentMediaType and contentEncoding annotate only",
        {"contentMediaType": "application/json", "contentEncoding": "base64"},
        [
            ("a valid base64 string", "eyJmb28iOiAiYmFyIn0K", True),
            ("an invalid base64 string (% is not a valid character)", "{}^", True),
            ("ignores non-strings", 100, True),
        ],
    ),
    (
        "contentSchema annotates only",
        {
            "contentMediaType": "application/json",
            "contentSchema": {"type": "object", "required": ["foo"]},
        },
        [
            ("anything goes - contentSchema does not assert", "{\"boo\": 42}", True),
        ],
    ),
    (
        "invalid instance should not raise error when float division = inf is avoided",
        {"type": "integer", "multipleOf": 0.5},
        [
            ("half divisible integer is valid", 10, True),
        ],
    ),
    (
        "default: invalid type for default (annotation only)",
        {"properties": {"foo": {"type": "integer", "default": []}}},
        [
            ("valid when property is specified", {"foo": 13}, True),
            ("still valid when the invalid default is used", {}, True),
        ],
    ),
    (
        "default: invalid string value for default",
        {"properties": {"bar": {"type": "string", "minLength": 4, "default": "bad"}}},
        [
            ("valid when property is specified", {"bar": "good"}, True),
            ("still valid when the invalid default is used", {}, True),
        ],
    ),
    (
        "infinite-loop-detection: evaluating the same schema location against the same data location twice is not a sign of an infinite loop",
        {
            "$defs": {"int": {"type": "integer"}},
            "allOf": [
                {"properties": {"foo": {"$ref": "#/$defs/int"}}},
                {"additionalProperties": {"$ref": "#/$defs/int"}},
            ],
        },
        [
            ("passing case", {"foo": 1}, True),
            ("failing case", {"foo": "a string"}, False),
        ],
    ),
    (
        "$comment: title and description are collected but ignored",
        {
            "title": "root title",
            "description": "root description",
            "$comment": "a comment",
            "type": "integer",
        },
        [
            ("integer valid", 1, True),
            ("string invalid", "x", False),
        ],
    ),
    (
        "deprecated/readOnly/writeOnly are collected but ignored",
        {"deprecated": True, "readOnly": True, "writeOnly": False, "type": "string"},
        [
            ("string valid", "x", True),
            ("integer invalid", 1, False),
        ],
    ),
    (
        "minLength/maxLength count Unicode code points, not bytes",
        {"minLength": 2, "maxLength": 2},
        [
            ("two supplementary-plane chars have length 2", "\U0001F600\U0001F601", True),
            ("three chars too long", "abc", False),
        ],
    ),
]

ANCHOR_ID = [
    (
        "Location-independent identifier",
        {
            "$ref": "#foo",
            "$defs": {"A": {"$anchor": "foo", "type": "integer"}},
        },
        [
            ("match", 1, True),
            ("mismatch", "a", False),
        ],
    ),
    (
        "Location-independent identifier with absolute URI",
        {
            "$ref": "http://localhost:1234/draft2020-12/bar#foo",
            "$defs": {
                "A": {"$id": "http://localhost:1234/draft2020-12/bar", "$anchor": "foo", "type": "integer"}
            },
        },
        [
            ("match", 1, True),
            ("mismatch", "a", False),
        ],
    ),
    (
        "Location-independent identifier with base URI change in subschema",
        {
            "$id": "http://localhost:1234/draft2020-12/root",
            "$ref": "http://localhost:1234/draft2020-12/nested.json#foo",
            "$defs": {
                "A": {
                    "$id": "nested.json",
                    "$defs": {"B": {"$anchor": "foo", "type": "integer"}},
                }
            },
        },
        [
            ("match", 1, True),
            ("mismatch", "a", False),
        ],
    ),
    (
        "same $anchor with different base uri",
        {
            "$id": "http://localhost:1234/draft2020-12/foobar",
            "$defs": {
                "A": {
                    "$id": "child1",
                    "allOf": [
                        {"$id": "child2", "$anchor": "my_anchor", "type": "number"},
                        {"$anchor": "my_anchor", "type": "string"},
                    ],
                }
            },
            "$ref": "child1#my_anchor",
        },
        [
            ("$ref resolves to /$defs/A/allOf/1", "a", True),
            ("$ref does not resolve to /$defs/A/allOf/0", 1, False),
        ],
    ),
    (
        "id: Invalid use of fragments in location-independent $id is just data under enum",
        {
            "$ref": "https://json-schema.org/draft/2020-12/schema"
        },
        [],  # needs the remote metaschema document — covered by catalog tests
    ),
    (
        "id inside an enum is not a real identifier",
        {
            "$defs": {
                "id_in_enum": {"enum": [{"$id": "https://localhost:1234/id/my_identifier.json", "type": "null"}]},
                "real_id_in_schema": {"$id": "https://localhost:1234/draft2020-12/id/my_identifier.json", "type": "string"},
                "zzz_id_in_const": {
                    "const": {"$id": "https://localhost:1234/id/my_identifier.json", "type": "null"}
                },
            },
            "anyOf": [
                {"$ref": "#/$defs/id_in_enum"},
                {"$ref": "https://localhost:1234/draft2020-12/id/my_identifier.json"},
            ],
        },
        [
            (
                "exact match to enum, and type matches",
                {"$id": "https://localhost:1234/id/my_identifier.json", "type": "null"},
                True,
            ),
            ("match $ref to $id", "a string to match #/$defs/id_in_enum", True),
            ("no match on enum or $ref to $id", 1, False),
        ],
    ),
    (
        "order of evaluation: $id and $ref",
        {
            "$comment": "$id must be evaluated before $ref to get the proper $ref destination",
            "$id": "https://example.net/ref-and-id1/base.json",
            "$ref": "int.json",
            "$defs": {
                "bigint": {
                    "$comment": "canonical uri: https://example.net/ref-and-id1/int.json",
                    "$id": "int.json",
                    "maximum": 10,
                },
                "smallint": {
                    "$comment": "canonical uri: https://example.net/ref-and-id1-int.json",
                    "$id": "/ref-and-id1-int.json",
                    "maximum": 2,
                },
            },
        },
        [
            ("data is valid against first definition", 5, True),
            ("data is invalid against first definition", 50, False),
        ],
    ),

    (
        "A $dynamicRef that initially resolves to a schema with a matching $dynamicAnchor resolves to the first $dynamicAnchor in the dynamic scope",
        {
            "$id": "https://test.json-schema.org/relative-dynamic-reference/root",
            "$dynamicAnchor": "meta",
            "type": "object",
            "properties": {"foo": {"const": "pass"}},
            "$ref": "extended",
            "$defs": {
                "extended": {
                    "$id": "extended",
                    "$dynamicAnchor": "meta",
                    "type": "object",
                    "properties": {"bar": {"$ref": "bar"}},
                },
                "bar": {
                    "$id": "bar",
                    "type": "object",
                    "properties": {"baz": {"$dynamicRef": "extended#meta"}},
                },
            },
        },
        [
            ("The recursive part is valid against the root", {"foo": "pass", "bar": {"baz": {"foo": "pass"}}}, True),
            ("The recursive part is not valid against the root", {"foo": "pass", "bar": {"baz": {"foo": "fail"}}}, False),
        ],
    ),
    (
        "A $dynamicRef with anchor resolving to boolean-ish subschema via bookending",
        {
            "$id": "https://test.json-schema.org/dynref-bool/root",
            "$ref": "list2",
            "$defs": {
                "foo": {"$dynamicAnchor": "items2", "type": "string"},
                "list2": {
                    "$id": "list2",
                    "type": "array",
                    "items": {"$dynamicRef": "#items2"},
                    "$defs": {"items2": {"$dynamicAnchor": "items2"}},
                },
            },
        },
        [
            ("string array valid", ["a", "b"], True),
            ("integer array invalid", [1, 2], False),
        ],
    ),
    (
        "strict-tree: multiple levels deep",
        {
            "$id": "https://test.json-schema.org/strict-tree-deep/base",
            "$dynamicAnchor": "node2",
            "$ref": "tree2",
            "unevaluatedProperties": False,
            "$defs": {
                "tree2": {
                    "$id": "tree2",
                    "$dynamicAnchor": "node2",
                    "type": "object",
                    "properties": {
                        "data": True,
                        "children": {"type": "array", "items": {"$dynamicRef": "#node2"}},
                    },
                }
            },
        },
        [
            (
                "two levels: misspelled field at depth 2 invalid",
                {"children": [{"data": 1, "children": [{"daat": 2}]}]},
                False,
            ),
            (
                "two levels: correct fields valid",
                {"children": [{"data": 1, "children": [{"data": 2}]}]},
                True,
            ),
        ],
    ),
    (
        "bignum: integer comparison (optional/bignum.json)",
        {"maximum": 18446744073709551615},
        [
            ("comparison works for high numbers", 18446744073709551600, True),
        ],
    ),
    (
        "bignum: float comparison with high precision",
        {"exclusiveMaximum": 9.727837981879871e26},
        [
            ("comparison works for high numbers", 9.727837981879871e26, False),
        ],
    ),
    (
        "unknown keywords are ignored",
        {"type": "integer", "fooBarUnknownKeyword": {"type": "string"}},
        [
            ("integer valid despite unknown keyword", 3, True),
            ("string invalid (known keyword still applies)", "x", False),
        ],
    ),
    (
        "sibling keywords alongside $ref all apply (2020-12)",
        {
            "$defs": {"reffed": {"minimum": 5}},
            "$ref": "#/$defs/reffed",
            "maximum": 10,
        },
        [
            ("within both bounds", 7, True),
            ("violates the $ref'd minimum", 3, False),
            ("violates the sibling maximum", 12, False),
        ],
    ),
]

# ref.json URN-base-URI family + id.json / anchor.json / dynamicRef.json
# scope-discipline cases (suite files ref.json, id.json, anchor.json,
# dynamicRef.json; consumed by /root/reference/tests/test_suite.py:143-158).
URN_AND_SCOPE = [
    (
        "simple URN base URI with $ref via the URN",
        {
            "$comment": "URIs do not have to have HTTP(s) schemes",
            "$id": "urn:uuid:deadbeef-1234-ffff-ffff-4321feebdaed",
            "minimum": 30,
            "properties": {
                "foo": {"$ref": "urn:uuid:deadbeef-1234-ffff-ffff-4321feebdaed"}
            },
        },
        [
            ("valid under the URN IDed schema", {"foo": 37}, True),
            ("invalid under the URN IDed schema", {"foo": 12}, False),
        ],
    ),
    (
        "URN base URI with JSON pointer ref",
        {
            "$id": "urn:uuid:deadbeef-1234-00ff-ff00-4321feebdaed",
            "properties": {"foo": {"$ref": "#/$defs/bar"}},
            "$defs": {"bar": {"type": "string"}},
        },
        [
            ("a string is valid", {"foo": "bar"}, True),
            ("a non-string is invalid", {"foo": 12}, False),
        ],
    ),
    (
        "URN base URI with URN and JSON pointer ref",
        {
            "$id": "urn:uuid:deadbeef-1234-0000-0000-4321feebdaed",
            "properties": {
                "foo": {
                    "$ref": "urn:uuid:deadbeef-1234-0000-0000-4321feebdaed#/$defs/bar"
                }
            },
            "$defs": {"bar": {"type": "string"}},
        },
        [
            ("a string is valid", {"foo": "bar"}, True),
            ("a non-string is invalid", {"foo": 12}, False),
        ],
    ),
    (
        "URN base URI with URN and anchor ref",
        {
            "$id": "urn:uuid:deadbeef-1234-ff00-00ff-4321feebdaed",
            "properties": {
                "foo": {
                    "$ref": "urn:uuid:deadbeef-1234-ff00-00ff-4321feebdaed#something"
                }
            },
            "$defs": {"bar": {"$anchor": "something", "type": "string"}},
        },
        [
            ("a string is valid", {"foo": "bar"}, True),
            ("a non-string is invalid", {"foo": 12}, False),
        ],
    ),
    (
        "relative refs with absolute uris and defs",
        {
            "$id": "http://example.com/schema-relative-uri-defs1.json",
            "properties": {
                "foo": {
                    "$id": "schema-relative-uri-defs2.json",
                    "$defs": {
                        "inner": {"properties": {"bar": {"type": "string"}}}
                    },
                    "$ref": "#/$defs/inner",
                }
            },
            "$ref": "schema-relative-uri-defs2.json",
        },
        [
            ("invalid on inner field", {"foo": {"bar": 1}}, False),
            ("valid on both fields", {"foo": {"bar": "a"}, "bar": "a"}, True),
        ],
    ),
    (
        "$id must be resolved against nearest parent, not just immediate parent",
        {
            "$id": "http://example.com/a.json",
            "$defs": {
                "x": {
                    "$id": "http://example.com/b/c.json",
                    "not": {
                        "$defs": {"y": {"$id": "d.json", "type": "number"}}
                    },
                }
            },
            "allOf": [{"$ref": "http://example.com/b/d.json"}],
        },
        [
            ("number is valid", 1, True),
            ("non-number is invalid", "a", False),
        ],
    ),
    (
        "non-schema object containing an $id property",
        {
            "$defs": {"const_not_id": {"const": {"$id": "not_a_real_id"}}},
            "if": {"const": "skip not_a_real_id"},
            "then": True,
            "else": {"$ref": "#/$defs/const_not_id"},
        },
        [
            ("skip traversing definition for a valid result", "skip not_a_real_id", True),
            ("const at const_not_id does not match", 1, False),
        ],
    ),
    (
        "$anchor inside an enum is not a real identifier",
        {
            "$defs": {
                "anchor_in_enum": {
                    "enum": [{"$anchor": "my_anchor", "type": "null"}]
                },
                "real_identifier_in_schema": {
                    "$anchor": "my_anchor",
                    "type": "string",
                },
                "zzz_anchor_in_const": {
                    "const": {"$anchor": "my_anchor", "type": "null"}
                },
            },
            "anyOf": [
                {"$ref": "#/$defs/anchor_in_enum"},
                {"$ref": "#my_anchor"},
            ],
        },
        [
            (
                "exact match to enum, and type matches",
                {"$anchor": "my_anchor", "type": "null"},
                True,
            ),
            ("in implementations that strip $anchor, this may match either $def", None, False),
            ("match $ref to $anchor", "a string to match #/$defs/anchor_in_enum", True),
            ("no match on enum or $ref to $anchor", 1, False),
        ],
    ),
    (
        "after leaving a dynamic scope, it is not used by a $dynamicRef",
        {
            "$id": "https://test.json-schema.org/dynamic-ref-leaving-dynamic-scope/main",
            "if": {
                "$id": "first_scope",
                "$defs": {
                    "thingy": {
                        "$comment": "this is first_scope#thingy",
                        "$dynamicAnchor": "thingy",
                        "type": "number",
                    }
                },
            },
            "then": {
                "$id": "second_scope",
                "$ref": "start",
                "$defs": {
                    "thingy": {
                        "$comment": "this is second_scope#thingy, the final destination of the $dynamicRef",
                        "$dynamicAnchor": "thingy",
                        "type": "null",
                    }
                },
            },
            "$defs": {
                "start": {
                    "$comment": "this is the landing spot from $ref",
                    "$id": "start",
                    "$dynamicRef": "inner_scope#thingy",
                },
                "thingy": {
                    "$comment": "this is the first stop for the $dynamicRef",
                    "$id": "inner_scope",
                    "$dynamicAnchor": "thingy",
                    "type": "string",
                },
            },
        },
        [
            ("string matches /$defs/thingy, but the $dynamicRef does not stop here", "a string", False),
            ("first_scope is not in dynamic scope for the $dynamicRef", 42, False),
            ("/then/$defs/thingy is the final stop for the $dynamicRef", None, True),
        ],
    ),
]

# ---------------------------------------------------------------------------
# Round-4 expansion: content.json, default.json, format.json (annotation
# behavior), infinite-loop-detection.json, optional/bignum.json,
# optional/dependencies-compatibility.json, optional/refOfUnknownKeyword.json
# and the portable slice of optional/ecmascript-regex.json. Every case below
# was probe-verified against the in-sandbox reference before porting.
#
# Documented dispositions for the rest of optional/ecmascript-regex.json:
# - `\cc` (lowercase control escape): Java computes the control char
#   case-sensitively ('c'^0x40='#'), ECMA case-insensitively — excluded.
# - `\s`/`\S` Unicode members (NBSP, EM SPACE, U+2029): Java's \s is
#   ASCII-only — engine delta vs ECMA, excluded (pattern dialect deltas,
#   SURVEY §2.9.1); the reference's Python-re dialect differs again.
# - `\p{Letter}` / `\p{digit}`: unknown property names on the JVM — now
#   refused at compile time (metaschema.py _java_prop_ok) instead of
#   blowing up the job; the reference's re dialect refuses them too.
# - `$` before a trailing newline: BOTH engines match (Java and Python
#   share the before-final-terminator rule; ECMA does not) — pinned in
#   test_ecma_trailing_newline_delta below.
# - zero-width whitespace ﻿ under \s: no engine matches; excluded.

CONTENT = [
    ("validation of string-encoded content based on media type",
     {"contentMediaType": "application/json"},
     [("a valid JSON document", '{"foo": "bar"}', True),
      ("an invalid JSON document; validates true", "{:}", True),
      ("ignores non-strings", 100, True)]),
    ("validation of binary string-encoding",
     {"contentEncoding": "base64"},
     [("a valid base64 string", "eyJmb28iOiAiYmFyIn0=", True),
      ("an invalid base64 string (% is not a valid character); validates true", "eyJmb28iOi%iYmFyIn0K", True),
      ("ignores non-strings", 100, True)]),
    ("validation of binary-encoded media type documents",
     {"contentMediaType": "application/json", "contentEncoding": "base64"},
     [("a valid base64-encoded JSON document", "eyJmb28iOiAiYmFyIn0=", True),
      ("a validly-encoded invalid JSON document; validates true", "ezp9Cg==", True),
      ("an invalid base64 string that is valid JSON; validates true", "{}", True),
      ("ignores non-strings", 100, True)]),
    ("validation of binary-encoded media type documents with schema",
     {"contentMediaType": "application/json", "contentEncoding": "base64",
      "contentSchema": {"type": "object", "required": ["foo"], "properties": {"foo": {"type": "string"}}}},
     [("a valid base64-encoded JSON document", "eyJmb28iOiAiYmFyIn0=", True),
      ("another valid base64-encoded JSON document", "eyJib28iOiAyMCwgImZvbyI6ICJiYXoifQ==", True),
      ("an invalid base64-encoded JSON document; validates true", "eyJib28iOiAyMH0=", True),
      ("an empty object as a base64-encoded JSON document; validates true", "e30=", True),
      ("an empty array as a base64-encoded JSON document; validates true", "W10=", True),
      ("a validly-encoded invalid JSON document; validates true", "ezp9Cg==", True),
      ("an invalid base64 string that is valid JSON; validates true", "{}", True),
      ("ignores non-strings", 100, True)]),
]

DEFAULT = [
    ("invalid type for default",
     {"properties": {"foo": {"type": "integer", "default": []}}},
     [("valid when property is specified", {"foo": 13}, True),
      ("still valid when the invalid default is used", {}, True)]),
    ("invalid string value for default",
     {"properties": {"bar": {"type": "string", "minLength": 4, "default": "bad"}}},
     [("valid when property is specified", {"bar": "good"}, True),
      ("still valid when the invalid default is used", {}, True)]),
    ("the default keyword does not do anything if the property is missing",
     {"type": "object", "properties": {"alpha": {"type": "number", "maximum": 3, "default": 5}}},
     [("an explicit property value is checked against maximum (passing)", {"alpha": 1}, True),
      ("an explicit property value is checked against maximum (failing)", {"alpha": 5}, False),
      ("missing properties are not filled in with the default", {}, True)]),
]


def _fmt_annotation_tests(fmt, bad):
    return [
        ("all string formats ignore integers", 12, True),
        ("all string formats ignore floats", 13.7, True),
        ("all string formats ignore objects", {}, True),
        ("all string formats ignore arrays", [], True),
        ("all string formats ignore booleans", False, True),
        ("all string formats ignore nulls", None, True),
        ("invalid %s string is only an annotation by default" % fmt, bad, True),
    ]


FORMAT_ANNOTATION = [
    ("email format", {"format": "email"}, _fmt_annotation_tests("email", "2962")),
    ("regex format", {"format": "regex"}, _fmt_annotation_tests("regex", "^(abc]")),
    ("ipv4 format", {"format": "ipv4"}, _fmt_annotation_tests("ipv4", "127.0.0.233333")),
    ("ipv6 format", {"format": "ipv6"}, _fmt_annotation_tests("ipv6", "12345::")),
    ("hostname format", {"format": "hostname"}, _fmt_annotation_tests("hostname", "-a-host-name-that-starts-with--")),
    ("date format", {"format": "date"}, _fmt_annotation_tests("date", "06/19/1963")),
    ("date-time format", {"format": "date-time"}, _fmt_annotation_tests("date-time", "1990-02-31T15:59:60.123-08:00")),
    ("time format", {"format": "time"}, _fmt_annotation_tests("time", "08:30:06 PST")),
    ("json-pointer format", {"format": "json-pointer"}, _fmt_annotation_tests("json-pointer", "/foo/bar~")),
    ("relative-json-pointer format", {"format": "relative-json-pointer"}, _fmt_annotation_tests("relative-json-pointer", "/foo/bar")),
    ("uri format", {"format": "uri"}, _fmt_annotation_tests("uri", "//foo.bar/?baz=qux#quux")),
    ("uri-reference format", {"format": "uri-reference"}, _fmt_annotation_tests("uri-reference", "\\\\WINDOWS\\fileshare")),
    ("uuid format", {"format": "uuid"}, _fmt_annotation_tests("uuid", "2eb8aa08-aa98-11ea-b4aa-73b441d1638")),
    ("duration format", {"format": "duration"}, _fmt_annotation_tests("duration", "PT1D")),
    ("unknown format", {"format": "unknown"}, _fmt_annotation_tests("unknown", "string")),
]

INFINITE_LOOP = [
    ("evaluating the same schema location against the same data location twice is not a sign of an infinite loop",
     {"$defs": {"int": {"type": "integer"}},
      "allOf": [{"properties": {"foo": {"$ref": "#/$defs/int"}}},
                {"additionalProperties": {"$ref": "#/$defs/int"}}]},
     [("passing case", {"foo": 1}, True),
      ("failing case", {"foo": "a string"}, False)]),
]

# out-of-int64 instances skip on the Spark side (documented int64
# typed-column delta); the reference side (arbitrary-precision Python
# ints) passes all of them, keeping the expectations machine-checked
BIGNUM = [
    ("integer", {"type": "integer"},
     [("a bignum is an integer", 12345678910111213141516171819202122232425, True),
      ("a negative bignum is an integer", -12345678910111213141516171819202122232425, True)]),
    ("number", {"type": "number"},
     [("a bignum is a number", 98249283749234923498293171823948729348710298301928331, True),
      ("a negative bignum is a number", -98249283749234923498293171823948729348710298301928331, True)]),
    ("string", {"type": "string"},
     [("a bignum is not a string", 98249283749234923498293171823948729348710298301928331, False)]),
    ("maximum integer comparison", {"maximum": 18446744073709551615},
     [("comparison works for high numbers", 18446744073709551600, True)]),
    ("float comparison with high precision", {"exclusiveMaximum": 972783798187987123879878123.18878137},
     [("comparison works for high numbers", 972783798187987123879878123.188781371, False)]),
    ("minimum integer comparison", {"minimum": -18446744073709551615},
     [("comparison works for very negative numbers", -18446744073709551600, True)]),
    ("float comparison with high precision on negative numbers",
     {"exclusiveMinimum": -972783798187987123879878123.18878137},
     [("comparison works for very negative numbers", -972783798187987123879878123.188781371, False)]),
]

# optional/dependencies-compatibility.json under an EXPLICIT 2020-12
# $schema, ported with the REFERENCE's verdicts: `dependencies` was
# removed in 2019-09, so both jschon and this engine treat it as an
# unknown keyword there (annotation, no assertion) — every instance
# validates. The official suite expects the compatibility behavior and
# the reference xfails the whole file ("unsupported optional test",
# /root/reference/tests/suite_status.json). Without a $schema this
# engine still honors `dependencies` via the permissive shape-driven
# legacy rewrite (tests/test_metaschema.py).
_D2020 = {"$schema": "https://json-schema.org/draft/2020-12/schema"}
DEPENDENCIES_COMPAT = [
    ("single dependency (2020-12: unknown keyword, never asserts)",
     {**_D2020, "dependencies": {"bar": ["foo"]}},
     [("neither", {}, True),
      ("nondependant", {"foo": 1}, True),
      ("with dependency", {"foo": 1, "bar": 2}, True),
      ("missing dependency validates (unknown keyword)", {"bar": 2}, True),
      ("ignores arrays", ["bar"], True),
      ("ignores strings", "foobar", True),
      ("ignores other non-objects", 12, True)]),
    ("multiple dependents (2020-12: unknown keyword, never asserts)",
     {**_D2020, "dependencies": {"quux": ["foo", "bar"]}},
     [("neither", {}, True),
      ("missing dependency validates (unknown keyword)", {"foo": 1, "quux": 2}, True),
      ("missing both dependencies validates (unknown keyword)", {"quux": 1}, True)]),
    ("single schema dependency (2020-12: unknown keyword, never asserts)",
     {**_D2020, "dependencies": {"bar": {"properties": {"foo": {"type": "integer"}, "bar": {"type": "integer"}}}}},
     [("valid", {"foo": 1, "bar": 2}, True),
      ("wrong type validates (unknown keyword)", {"foo": "quux", "bar": 2}, True),
      ("ignores non-objects", 12, True)]),
    ("boolean subschemas (2020-12: unknown keyword, never asserts)",
     {**_D2020, "dependencies": {"foo": True, "bar": False}},
     [("object with property having schema false validates (unknown keyword)", {"bar": 2}, True),
      ("empty object is valid", {}, True)]),
]

# optional/refOfUnknownKeyword.json with the SUITE's expectations: this
# engine resolves JSON-pointer refs into unknown-keyword values (the
# optional behavior the suite asks for); the reference refuses at
# compile (CatalogError — xfail'd in its own suite run), so the parity
# harness records a documented skip for these.
REF_UNKNOWN_KW = [
    ("reference of a root arbitrary keyword",
     {"unknown-keyword": {"type": "integer"}, "properties": {"bar": {"$ref": "#/unknown-keyword"}}},
     [("match", {"bar": 3}, True),
      ("mismatch", {"bar": True}, False)]),
    ("reference of an arbitrary keyword of a sub-schema",
     {"properties": {"foo": {"unknown-keyword": {"type": "integer"}},
                     "bar": {"$ref": "#/properties/foo/unknown-keyword"}}},
     [("match", {"bar": 3}, True),
      ("mismatch", {"bar": True}, False)]),
]

_FRENCH_ASCII = ("Les hivers de mon enfance etaient des saisons longues, longues. "
                 "Nous vivions en trois lieux: l'ecole, l'eglise et la patinoire; "
                 "mais la vraie vie etait sur la patinoire.")
_FRENCH_UNI = ("Les hivers de mon enfance étaient des saisons longues, longues. "
               "Nous vivions en trois lieux: l'école, l'église et la patinoire; "
               "mais la vraie vie était sur la patinoire.")

# the slice of optional/ecmascript-regex.json where BOTH engines match
# the suite expectation (probe-verified)
ECMA_REGEX_PORTABLE = [
    ("ECMA 262 regex converts \\t to horizontal tab",
     {"type": "string", "pattern": "^\\t$"},
     [("does not match", "\\t", False),
      ("matches", "\u0009", True)]),
    ("ECMA 262 regex escapes control codes with \\c and upper letter",
     {"type": "string", "pattern": "^\\cC$"},
     [("does not match", "\\cC", False),
      ("matches", "\u0003", True)]),
    ("pattern with ASCII ranges",
     {"pattern": "[a-z]cole"},
     [("literal unicode character in json string", _FRENCH_UNI, False),
      ("ascii characters match", _FRENCH_ASCII, True)]),
]

SUITE = (
    [("boolean_schema", *g) for g in BOOLEAN_SCHEMA]
    + [("type", *g) for g in TYPE]
    + [("enum", *g) for g in ENUM]
    + [("const", *g) for g in CONST]
    + [("numeric", *g) for g in NUMERIC]
    + [("strings", *g) for g in STRINGS]
    + [("arrays", *g) for g in ARRAYS]
    + [("objects", *g) for g in OBJECTS]
    + [("properties", *g) for g in PROPERTIES]
    + [("dependentSchemas", *g) for g in DEPENDENT_SCHEMAS]
    + [("combinators", *g) for g in COMBINATORS]
    + [("conditionals", *g) for g in CONDITIONALS]
    + [("items", *g) for g in ITEMS]
    + [("prefixItems", *g) for g in PREFIX_ITEMS]
    + [("contains", *g) for g in CONTAINS]
    + [("refs", *g) for g in REFS]
    + [("dynamicRef", *g) for g in DYNAMIC_REF]
    + [("unevaluatedProperties", *g) for g in UNEVALUATED_PROPS]
    + [("unevaluatedItems", *g) for g in UNEVALUATED_ITEMS]
    + [("misc", *g) for g in MISC]
    + [("anchor-id", *g) for g in ANCHOR_ID]
    + [("urn-scope", *g) for g in URN_AND_SCOPE]
    + [("content", *g) for g in CONTENT]
    + [("default", *g) for g in DEFAULT]
    + [("format-annotation", *g) for g in FORMAT_ANNOTATION]
    + [("infinite-loop-detection", *g) for g in INFINITE_LOOP]
    + [("bignum", *g) for g in BIGNUM]
    + [("dependencies-compatibility", *g) for g in DEPENDENCIES_COMPAT]
    + [("refOfUnknownKeyword", *g) for g in REF_UNKNOWN_KW]
    + [("ecmascript-regex", *g) for g in ECMA_REGEX_PORTABLE]
)

# parametrized by (group index, test index): each group's instances are
# evaluated in ONE batched pass (memoized), not one Spark job per case —
# same pass/skip surface as the per-case harness, ~10x less wall-clock
CASES = [
    pytest.param(gi, ti, id=f"{fname}|{gdesc}|{tdesc}")
    for gi, (fname, gdesc, schema, tests) in enumerate(SUITE)
    for ti, (tdesc, data, valid) in enumerate(tests)
]

_BATCH: dict = {}


@pytest.mark.parametrize("gi,ti", CASES)
def test_suite_case(spark, gi, ti):
    _fname, _gdesc, schema, tests = SUITE[gi]
    try:
        check_case_in_group(spark, schema, tests, ti, _BATCH, gi)
    except Untypeable as e:
        pytest.skip(f"no single Spark type for instance (typed-column delta, SURVEY §2.9.1): {e}")


# --------------------------------------------------------------------------
# optional/ecmascript-regex.json groups where the SPARK ENGINE meets the
# suite expectation but the reference's Python-re dialect does not (re's
# \d/\w classes are Unicode-wide; ECMA-262's — and Java's — default to
# ASCII). The reference xfails these in its own suite run
# (/root/reference/tests/suite_status.json "unsupported optional test"),
# so they are kept out of the parity-checked SUITE and asserted against
# the Spark engine only.

SPARK_ONLY_SUITE = [
    ("ecmascript-regex",
     "ECMA 262 \\d matches ascii digits only",
     {"type": "string", "pattern": "^\\d$"},
     [("ASCII zero matches", "0", True),
      ("NKO DIGIT ZERO does not match (unlike e.g. Python)", "߀", False)]),
    ("ecmascript-regex",
     "ECMA 262 \\D matches everything but ascii digits",
     {"type": "string", "pattern": "^\\D$"},
     [("ASCII zero does not match", "0", False),
      ("NKO DIGIT ZERO matches (unlike e.g. Python)", "߀", True)]),
    ("ecmascript-regex",
     "ECMA 262 \\w matches ascii letters only",
     {"type": "string", "pattern": "^\\w$"},
     [("ASCII 'a' matches", "a", True),
      ("latin-1 e-acute does not match (unlike e.g. Python)", "é", False)]),
    ("ecmascript-regex",
     "ECMA 262 \\W matches everything but ascii letters",
     {"type": "string", "pattern": "^\\W$"},
     [("ASCII 'a' does not match", "a", False),
      ("latin-1 e-acute matches (unlike e.g. Python)", "é", True)]),
    ("ecmascript-regex",
     "\\w in patterns matches [A-Za-z0-9_], not unicode letters",
     {"pattern": "\\wcole"},
     [("ascii character in json string", _FRENCH_ASCII, True),
      ("literal unicode character in json string", _FRENCH_UNI, False)]),
    ("ecmascript-regex",
     "\\d in pattern matches [0-9], not unicode digits",
     {"pattern": "^\\d+$"},
     [("ascii digits", "42", True),
      ("ascii non-digits", "-%#", False),
      ("non-ascii digits (BENGALI DIGIT FOUR, BENGALI DIGIT TWO)", "৪২", False)]),
]

SPARK_ONLY_CASES = [
    pytest.param(gi, ti, id=f"{fname}|{gdesc}|{tdesc}")
    for gi, (fname, gdesc, schema, tests) in enumerate(SPARK_ONLY_SUITE)
    for ti, (tdesc, data, valid) in enumerate(tests)
]

_SPARK_ONLY_BATCH: dict = {}


@pytest.mark.parametrize("gi,ti", SPARK_ONLY_CASES)
def test_suite_case_spark_only(spark, gi, ti):
    _fname, _gdesc, schema, tests = SPARK_ONLY_SUITE[gi]
    try:
        check_case_in_group(spark, schema, tests, ti, _SPARK_ONLY_BATCH, gi)
    except Untypeable as e:
        pytest.skip(f"no single Spark type for instance (typed-column delta, SURVEY §2.9.1): {e}")


def test_ecma_trailing_newline_delta(spark):
    """Documented delta vs ECMA-262 (optional/ecmascript-regex.json
    "ECMA 262 regex $ does not match trailing newline"): both the JVM
    runtime dialect AND the reference's Python re let `$` match before a
    final line terminator, so "abc\\n" satisfies ^abc$ in BOTH engines —
    pinned here so a regression in either direction is loud."""
    from jschon_spark.testing import evaluate_batch

    got = evaluate_batch(spark, {"type": "string", "pattern": "^abc$"}, ["abc\n", "abc"])
    assert got == [True, True]


# --------------------------------------------------------------------------
# tests/suite_port_status.json: the machine-readable coverage/skip
# registry (the port analogue of the reference's tests/suite_status.json).
# These guards keep it honest: every SUITE section tag must be claimed by
# a registry file entry, every non-ported entry must cite a registered
# reason, and every section the registry names must actually exist.

def _load_registry():
    import json as _json
    import os as _os

    here = _os.path.dirname(_os.path.abspath(__file__))
    with open(_os.path.join(here, "suite_port_status.json")) as f:
        return _json.load(f)


def test_registry_covers_every_suite_section():
    reg = _load_registry()
    claimed = {s for e in reg["files"].values() for s in e.get("sections", [])}
    actual = {fname for (fname, _g, _s, _t) in SUITE}
    actual |= {fname for (fname, _g, _s, _t) in SPARK_ONLY_SUITE}
    missing = actual - claimed
    assert not missing, f"SUITE sections not claimed by any registry file: {missing}"
    ghost = claimed - actual
    assert not ghost, f"registry names sections that do not exist: {ghost}"


def test_registry_skips_cite_registered_reasons():
    reg = _load_registry()
    reasons = set(reg["reasons"])
    for fname, entry in reg["files"].items():
        cov = entry["coverage"]
        assert cov in ("ported", "partial", "omitted", "covered-elsewhere"), (fname, cov)
        if cov in ("partial", "omitted"):
            assert entry.get("reason") in reasons, (
                f"{fname}: {cov} without a registered reason"
            )
        if cov == "covered-elsewhere":
            assert entry.get("notes"), f"{fname}: covered-elsewhere without notes"
    # the runtime skip reasons used by the harness are registered too
    assert {"untypeable", "int64"} <= reasons
