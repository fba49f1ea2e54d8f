"""Ported JSON-Schema-Test-Suite-style cases for validation keywords.

Case format mirrors the suite files the reference consumes
(/root/reference/tests/test_suite.py:143-158): (schema, data, valid).
The suite submodule is empty in this sandbox and jschon itself is not
runnable (missing rfc3986), so cases are literal, per SURVEY.md §5.
Semantics cross-checked against /root/reference/jschon/vocabulary/
validation.py (cited per block).
"""

import pytest

from jschon_spark.testing import check_case

# type — validation.py:33-46 (integer accepts zero-fraction numbers, :40-41)
TYPE_CASES = [
    ({"type": "integer"}, 1, True),
    ({"type": "integer"}, 1.0, True),
    ({"type": "integer"}, 1.5, False),
    ({"type": "integer"}, "1", False),
    ({"type": "integer"}, True, False),
    ({"type": "number"}, 1, True),
    ({"type": "number"}, 1.5, True),
    ({"type": "number"}, "x", False),
    ({"type": "string"}, "x", True),
    ({"type": "string"}, 1, False),
    ({"type": "null"}, None, True),
    ({"type": "null"}, 0, False),
    ({"type": "boolean"}, True, True),
    ({"type": "boolean"}, 0, False),
    ({"type": "array"}, [1, 2], True),
    ({"type": "array"}, {"a": 1}, False),
    ({"type": "object"}, {"a": 1}, True),
    ({"type": "object"}, [1], False),
    ({"type": ["integer", "string"]}, "x", True),
    ({"type": ["integer", "string"]}, 1, True),
    ({"type": ["integer", "string"]}, 1.5, False),
    ({"type": ["null", "number"]}, None, True),
]

# enum — validation.py:49-55 (deep equality incl. cross-type numerics)
ENUM_CASES = [
    ({"enum": [1, 2, 3]}, 2, True),
    ({"enum": [1, 2, 3]}, 4, False),
    ({"enum": [1]}, 1.0, True),
    ({"enum": ["a", None]}, None, True),
    ({"enum": ["a", "b"]}, "c", False),
    ({"enum": [[1, 2]]}, [1, 2], True),
    ({"enum": [[1, 2]]}, [1, 3], False),
    ({"enum": [{"a": 1}]}, {"a": 1}, True),
    ({"enum": [{"a": 1}]}, {"a": 2}, False),
    ({"enum": [True]}, 1, False),
    ({"enum": [6], "type": "integer"}, 6, True),
]

# const — validation.py:58-63
CONST_CASES = [
    ({"const": 2}, 2, True),
    ({"const": 2}, 2.0, True),
    ({"const": 2}, 3, False),
    ({"const": None}, None, True),
    ({"const": None}, 0, False),
    ({"const": {"a": [1]}}, {"a": [1]}, True),
    ({"const": {"a": [1]}}, {"a": [2]}, False),
    ({"const": "x"}, "x", True),
]

# numeric bounds + multipleOf — validation.py:66-111 (Decimal exactness :72)
NUMERIC_CASES = [
    ({"multipleOf": 2}, 4, True),
    ({"multipleOf": 2}, 5, False),
    ({"multipleOf": 1.5}, 4.5, True),
    ({"multipleOf": 0.1}, 0.3, True),
    ({"multipleOf": 0.01}, 0.03, True),
    ({"multipleOf": 2}, "x", True),  # wrong type → vacuous pass
    ({"maximum": 5}, 5, True),
    ({"maximum": 5}, 5.1, False),
    ({"maximum": 5}, "x", True),
    ({"exclusiveMaximum": 5}, 5, False),
    ({"exclusiveMaximum": 5}, 4.9, True),
    ({"minimum": 5}, 5, True),
    ({"minimum": 5}, 4, False),
    ({"exclusiveMinimum": 5}, 5, False),
    ({"exclusiveMinimum": 5}, 6, True),
]

# string keywords — validation.py:114-142 (pattern is UNANCHORED, :132-142)
STRING_CASES = [
    ({"maxLength": 3}, "abc", True),
    ({"maxLength": 3}, "abcd", False),
    ({"maxLength": 3}, 5, True),
    ({"minLength": 2}, "ab", True),
    ({"minLength": 2}, "a", False),
    ({"pattern": "a+"}, "xaay", True),
    ({"pattern": "^a+$"}, "xaay", False),
    ({"pattern": "^clip-[0-9a-f]+$"}, "clip-00ff", True),
    ({"pattern": "^clip-[0-9a-f]+$"}, "CLIP-00ff", False),
    ({"pattern": "a"}, 1, True),
]

# array keywords — validation.py:145-212
ARRAY_CASES = [
    ({"maxItems": 2}, [1, 2], True),
    ({"maxItems": 2}, [1, 2, 3], False),
    ({"minItems": 2}, [1], False),
    ({"minItems": 2}, [1, 2], True),
    ({"uniqueItems": True}, [1, 2, 3], True),
    ({"uniqueItems": True}, [1, 2, 1], False),
    ({"uniqueItems": True}, [1, 1.0], False),
    ({"uniqueItems": True}, [[1], [1]], False),
    ({"uniqueItems": True}, [{"a": 1}, {"a": 1}], False),
    ({"uniqueItems": True}, [{"a": 1}, {"a": 2}], True),
    ({"uniqueItems": False}, [1, 1], True),
    ({"contains": {"minimum": 5}}, [1, 6], True),
    ({"contains": {"minimum": 5}}, [1, 2], False),
    ({"contains": {"minimum": 5}}, [], False),
    # minContains: 0 rescues contains (validation.py:205-208)
    ({"contains": {"minimum": 5}, "minContains": 0}, [1], True),
    ({"contains": {"minimum": 5}, "minContains": 2}, [6, 1], False),
    ({"contains": {"minimum": 5}, "minContains": 2}, [6, 7], True),
    ({"contains": {"minimum": 5}, "maxContains": 1}, [6, 7], False),
    ({"contains": {"minimum": 5}, "maxContains": 2}, [6, 7], True),
]

# object keywords — validation.py:215-256
OBJECT_CASES = [
    ({"maxProperties": 1}, {"a": 1, "b": 2}, False),
    ({"maxProperties": 2}, {"a": 1, "b": 2}, True),
    ({"minProperties": 2}, {"a": 1}, False),
    ({"minProperties": 1}, {"a": 1}, True),
    ({"required": ["a"]}, {"a": 1}, True),
    ({"required": ["a", "b"]}, {"a": 1}, False),
    ({"required": ["a"]}, {}, False),
    ({"required": []}, {"a": 1}, True),
    ({"dependentRequired": {"a": ["b"]}}, {"a": 1, "b": 2}, True),
    ({"dependentRequired": {"a": ["b"]}}, {"a": 1}, False),
    ({"dependentRequired": {"a": ["b"]}}, {"c": 1}, True),
]


def _run(spark, cases):
    for schema, data, valid in cases:
        check_case(spark, schema, data, valid)


@pytest.mark.parametrize(
    "block",
    [TYPE_CASES, ENUM_CASES, CONST_CASES, NUMERIC_CASES, STRING_CASES, ARRAY_CASES, OBJECT_CASES],
    ids=["type", "enum", "const", "numeric", "string", "array", "object"],
)
def test_validation_keywords(spark, block):
    _run(spark, block)


def test_boolean_schemas(spark):
    # jschon/jsonschema.py:201-205
    _run(
        spark,
        [
            (True, 5, True),
            (False, 5, False),
            ({}, 5, True),
            ({"properties": {"a": False}}, {"a": 1}, False),
            ({"properties": {"a": True}}, {"a": 1}, True),
        ],
    )


def test_violation_rows_basic_format(spark):
    """Violation rows carry jschon `basic`-style locations
    (jschon/output.py:54-59)."""
    from jschon_spark.testing import evaluate_instance

    schema = {
        "properties": {
            "name": {"type": "string", "minLength": 3},
            "age": {"minimum": 0},
        },
        "required": ["name"],
    }
    valid, viols = evaluate_instance(spark, schema, {"name": "ab", "age": -1})
    assert not valid
    got = {(v["instance_path"], v["keyword"]) for v in viols}
    assert got == {("/name", "minLength"), ("/age", "minimum")}
    kw_paths = {v["keyword_path"] for v in viols}
    assert "/properties/name/minLength" in kw_paths
    assert "/properties/age/minimum" in kw_paths


def test_enum_explicit_null_field_vs_absent_in_batch(spark):
    """A compound enum value with an explicit null at a field that the
    BATCH dtype types concretely can never match: a null in a
    concrete-typed struct field means ABSENT (presence convention,
    core.py _has_prop), and the reference distinguishes {} from
    {"d": null} (json.py:277-289 deep equality over key sets).
    Campaign-derived (eq seed 5144): {} batched alongside an instance
    that forces d to a concrete type must stay non-matching, while the
    standalone {"d": None} instance (NullType field = present-as-null)
    still matches."""
    from jschon_spark.testing import evaluate_batch

    schema = {"enum": [{"d": None}, "bb"]}
    # batch: {} unifies with {"d": {"a": 1}} -> d is concrete struct
    res = evaluate_batch(spark, schema, [{}, {"d": {"a": 1}}, "bb"])
    assert res == [False, False, True]
    # standalone: d typed NullType -> present-as-null matches the value
    res2 = evaluate_batch(spark, schema, [{"d": None}])
    assert res2 == [True]
