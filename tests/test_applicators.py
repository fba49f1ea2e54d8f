"""Applicator + reference keyword cases (reference
jschon/vocabulary/applicator.py and core.py; suite-style, see
tests/test_keywords.py docstring)."""

import pytest

from jschon_spark.testing import check_case

# in-place applicators — applicator.py:28-86
COMBINATOR_CASES = [
    ({"allOf": [{"minimum": 0}, {"maximum": 10}]}, 5, True),
    ({"allOf": [{"minimum": 0}, {"maximum": 10}]}, 11, False),
    ({"anyOf": [{"minimum": 10}, {"multipleOf": 2}]}, 4, True),
    ({"anyOf": [{"minimum": 10}, {"multipleOf": 2}]}, 3, False),
    ({"oneOf": [{"minimum": 5}, {"maximum": 6}]}, 7, True),
    ({"oneOf": [{"minimum": 5}, {"maximum": 6}]}, 5, False),  # both match
    ({"oneOf": [{"minimum": 5}, {"maximum": 3}]}, 4, False),  # neither
    ({"not": {"type": "integer"}}, "x", True),
    ({"not": {"type": "integer"}}, 1, False),
    ({"not": {"not": {"type": "integer"}}}, 1, True),
]

# if/then/else — applicator.py:89-116 (`if` alone never asserts)
CONDITIONAL_CASES = [
    ({"if": {"minimum": 5}, "then": {"multipleOf": 2}}, 6, True),
    ({"if": {"minimum": 5}, "then": {"multipleOf": 2}}, 7, False),
    ({"if": {"minimum": 5}, "then": {"multipleOf": 2}}, 3, True),
    ({"if": {"minimum": 5}, "else": {"multipleOf": 2}}, 3, False),
    ({"if": {"minimum": 5}, "else": {"multipleOf": 2}}, 4, True),
    ({"if": {"minimum": 5}}, 1, True),
    ({"then": {"multipleOf": 2}}, 7, True),  # then without if is ignored
    (
        {"if": {"minimum": 5}, "then": {"maximum": 10}, "else": {"maximum": 2}},
        11,
        False,
    ),
    ({"if": {"minimum": 5}, "then": {"maximum": 10}, "else": {"maximum": 2}}, 3, False),
    ({"if": {"minimum": 5}, "then": {"maximum": 10}, "else": {"maximum": 2}}, 1, True),
]

# dependentSchemas — applicator.py:119-139
DEPENDENT_CASES = [
    ({"dependentSchemas": {"a": {"required": ["b"]}}}, {"a": 1, "b": 2}, True),
    ({"dependentSchemas": {"a": {"required": ["b"]}}}, {"a": 1}, False),
    ({"dependentSchemas": {"a": {"required": ["b"]}}}, {"c": 1}, True),
]

# array applicators — applicator.py:142-250
ARRAY_APPLICATOR_CASES = [
    ({"prefixItems": [{"minimum": 5}]}, [6, 1], True),
    ({"prefixItems": [{"minimum": 5}]}, [4], False),
    ({"prefixItems": [{"minimum": 5}, {"maximum": 2}]}, [6, 1], True),
    ({"prefixItems": [{"minimum": 5}, {"maximum": 2}]}, [6, 3], False),
    ({"prefixItems": [{"minimum": 5}]}, [], True),  # shorter than prefix
    ({"items": {"minimum": 0}}, [0, 1, 2], True),
    ({"items": {"minimum": 0}}, [0, -1], False),
    ({"items": {"minimum": 0}}, [], True),
    ({"prefixItems": [{"minimum": 5}], "items": {"maximum": 2}}, [9, 1, 2], True),
    ({"prefixItems": [{"minimum": 5}], "items": {"maximum": 2}}, [9, 3], False),
    ({"items": {"type": "integer"}}, [1.0, 2.5], False),
]

# object applicators — applicator.py:253-380
OBJECT_APPLICATOR_CASES = [
    ({"properties": {"a": {"minimum": 0}}}, {"a": 1}, True),
    ({"properties": {"a": {"minimum": 0}}}, {"a": -1}, False),
    ({"properties": {"a": {"minimum": 0}}}, {"b": 1}, True),
    (
        {"properties": {"a": {"properties": {"b": {"type": "string"}}}}},
        {"a": {"b": "x"}},
        True,
    ),
    (
        {"properties": {"a": {"properties": {"b": {"type": "string"}}}}},
        {"a": {"b": 1}},
        False,
    ),
    ({"patternProperties": {"^S_": {"type": "string"}}}, {"S_x": "ok"}, True),
    ({"patternProperties": {"^S_": {"type": "string"}}}, {"S_x": 1}, False),
    ({"patternProperties": {"^S_": {"type": "string"}}}, {"x": 1}, True),
    (
        {"properties": {"a": {}}, "additionalProperties": False},
        {"a": 1},
        True,
    ),
    (
        {"properties": {"a": {}}, "additionalProperties": False},
        {"a": 1, "b": 2},
        False,
    ),
    (
        {
            "properties": {"a": {}},
            "patternProperties": {"^S_": {}},
            "additionalProperties": False,
        },
        {"a": 1, "S_b": 2},
        True,
    ),
    ({"additionalProperties": {"type": "integer"}}, {"a": 1, "b": 2}, True),
    ({"additionalProperties": {"type": "integer"}}, {"a": "x"}, False),
    ({"propertyNames": {"maxLength": 3}}, {"ab": 1, "abc": 2}, True),
    ({"propertyNames": {"maxLength": 3}}, {"abcd": 1}, False),
    ({"propertyNames": {"pattern": "^[a-z]+$"}}, {"ok": 1}, True),
    ({"propertyNames": {"pattern": "^[a-z]+$"}}, {"Bad": 1}, False),
]

# $ref / $defs / $anchor — core.py:82-118 (compile-time inlining)
REF_CASES = [
    ({"$defs": {"pos": {"minimum": 0}}, "$ref": "#/$defs/pos"}, 5, True),
    ({"$defs": {"pos": {"minimum": 0}}, "$ref": "#/$defs/pos"}, -1, False),
    ({"$defs": {"p": {"$anchor": "pos", "minimum": 0}}, "$ref": "#pos"}, 3, True),
    ({"$defs": {"p": {"$anchor": "pos", "minimum": 0}}, "$ref": "#pos"}, -3, False),
    (
        {
            "$id": "https://example.com/root",
            "$defs": {"s": {"$id": "sub", "type": "string"}},
            "$ref": "https://example.com/sub",
        },
        "x",
        True,
    ),
    (
        {
            "properties": {
                "v": {"type": "integer"},
                "child": {"$ref": "#"},
            }
        },
        {"v": 1, "child": {"v": 2, "child": None}},
        True,
    ),
    (
        {
            "properties": {
                "v": {"type": "integer"},
                "child": {"$ref": "#"},
            }
        },
        {"v": 1, "child": {"v": 2.5, "child": None}},
        False,
    ),
]

# unevaluated* — applicator.py:190-232, 333-365 (static closure, SURVEY §2.2)
# annotations flow OUT of a passing `not`: the reference evaluates the
# subschema into the /not result node itself and inverts only that
# node's validity (applicator.py:77-86), so when `not` passes (inner
# FAILED overall) its individually-valid keyword nodes still annotate
# and cover for sibling unevaluated*. Every case here was verified
# against the reference live (round-3 fuzz seed 1 found the family).
NOT_COVERAGE_CASES = [
    # inner fails via required; additionalProperties:true still covers
    ({"not": {"additionalProperties": True, "required": ["zz"]},
      "unevaluatedProperties": False}, {"a": 1}, True),
    # `not` itself fails (inner passed) → /not node invalid → no flow
    ({"not": {"additionalProperties": True},
      "unevaluatedProperties": False}, {"a": 1}, False),
    # a failed /allOf node prunes even its valid branches (node-validity
    # chain, jsonschema.py:518)
    ({"not": {"allOf": [{"properties": {"a": {"type": "integer"}}}, False]},
      "unevaluatedProperties": False}, {"a": 1}, False),
    # a valid anyOf branch inside the failed inner still flows
    ({"not": {"anyOf": [{"properties": {"a": True}}], "required": ["zz"]},
      "unevaluatedProperties": False}, {"a": 1}, True),
    # oneOf double-match: /oneOf node invalid → both valid branches pruned
    ({"not": {"oneOf": [{"properties": {"a": True}}, {"type": "object"}]},
      "unevaluatedProperties": False}, {"a": 1}, False),
    # prefixItems inside failed inner covers indices < len
    ({"not": {"prefixItems": [True, True], "minItems": 99},
      "unevaluatedItems": False}, [1, 2], True),
    # contains inside failed inner covers ONLY matched elements
    ({"not": {"contains": {"minimum": 2}, "minItems": 99},
      "unevaluatedItems": False}, [1, 2], False),
    # items keyword that itself failed contributes nothing
    ({"not": {"items": {"minimum": 2}}, "unevaluatedItems": False}, [1, 2], False),
    ({"not": {"items": {"minimum": 2}, "minItems": 99},
      "unevaluatedItems": False}, [2, 3], True),
    # a failed sibling dependency prunes the whole /dependentSchemas node
    ({"not": {"dependentSchemas": {
        "a": {"properties": {"a": True, "b": True}},
        "b": {"type": "string"}}},
      "unevaluatedProperties": False}, {"a": 1, "b": 2}, False),
    ({"not": {"dependentSchemas": {
        "a": {"properties": {"a": True, "b": True}}},
      "required": ["zz"]},
      "unevaluatedProperties": False}, {"a": 1, "b": 2}, True),
    # nested not-not: inner-inner PASSED → inner /not node invalid → no flow
    ({"not": {"not": {"properties": {"a": True}, "required": ["zz"]}},
      "unevaluatedProperties": False}, {"a": 1}, False),
    # nested unevaluatedProperties inside failed inner covers everything
    ({"not": {"unevaluatedProperties": True, "required": ["zz"]},
      "unevaluatedProperties": False}, {"a": 1}, True),
    ({"not": {"patternProperties": {"^a": True}, "required": ["zz"]},
      "unevaluatedProperties": False}, {"a1": 1, "b": 2}, False),
]

# dependentSchemas is OBJECT-scoped (the keyword never evaluates on an
# array — reference applicator.py instance_types), so a dep-sourced
# items/unevaluatedItems contributes NO array coverage even though bare
# required/dependentSchemas keywords are vacuously valid on arrays
# (ref-fuzz seed 3; verified against the reference live)
OBJECT_SCOPED_SOURCE_CASES = [
    ({"dependentSchemas": {"d": {"items": True}}, "unevaluatedItems": False},
     [1, 2], False),
    ({"anyOf": [{"dependentSchemas": {"d": {"unevaluatedItems": True}}}],
      "unevaluatedItems": False}, [1, 2], False),
    # ... while on an object instance the dep DOES apply and passes
    ({"dependentSchemas": {"d": {"items": True}}, "unevaluatedItems": False},
     {"d": 1}, True),
]

# node-validity pruning in POSITIVE context: a failed applicator node
# contributes no coverage, so unevaluated* reports the members too —
# the violation set (not just the verdict) matches the reference
POSITIVE_NODE_PRUNE_CASES = [
    ({"oneOf": [{"properties": {"a": True}}, {"type": "object"}],
      "unevaluatedProperties": False}, {"a": 1}, False),
    ({"allOf": [{"properties": {"a": True}}, False],
      "unevaluatedProperties": False}, {"a": 1}, False),
]

UNEVALUATED_CASES = [
    ({"properties": {"a": {}}, "unevaluatedProperties": False}, {"a": 1}, True),
    ({"properties": {"a": {}}, "unevaluatedProperties": False}, {"a": 1, "b": 2}, False),
    (
        {
            "allOf": [{"properties": {"b": {}}}],
            "properties": {"a": {}},
            "unevaluatedProperties": False,
        },
        {"a": 1, "b": 2},
        True,
    ),
    (
        {
            "allOf": [{"patternProperties": {"^x": {}}}],
            "unevaluatedProperties": False,
        },
        {"xa": 1, "y": 2},
        False,
    ),
    (
        {"unevaluatedProperties": {"type": "integer"}},
        {"a": 1, "b": 2},
        True,
    ),
    (
        {"unevaluatedProperties": {"type": "integer"}},
        {"a": "x"},
        False,
    ),
    # conditional coverage: the if-branch only covers when it passes
    (
        {
            "if": {"properties": {"a": {"minimum": 5}}, "required": ["a"]},
            "unevaluatedProperties": False,
        },
        {"a": 6},
        True,
    ),
    # then-branch coverage is guarded by the IF condition AND the then
    # subschema itself validating (annotations flow only from valid
    # results: applicator.py:97-105 + jsonschema.py:515-524)
    (
        {
            "if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
            "then": {"properties": {"extra": {}}},
            "properties": {"kind": {}},
            "unevaluatedProperties": False,
        },
        {"kind": "a", "extra": "x"},
        True,
    ),
    (
        {
            "if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
            "then": {"properties": {"extra": {}}},
            "properties": {"kind": {}},
            "unevaluatedProperties": False,
        },
        {"kind": "b", "extra": "x"},  # if fails → then coverage OFF
        False,
    ),
    # else-branch coverage is guarded by the IF condition FAILING
    (
        {
            "if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
            "else": {"properties": {"alt": {}}},
            "properties": {"kind": {}},
            "unevaluatedProperties": False,
        },
        {"kind": "b", "alt": "x"},
        True,
    ),
    (
        {
            "if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
            "else": {"properties": {"alt": {}}},
            "properties": {"kind": {}},
            "unevaluatedProperties": False,
        },
        {"kind": "a", "alt": "x"},  # if passes → else coverage OFF
        False,
    ),
    ({"prefixItems": [{}], "unevaluatedItems": False}, [1], True),
    ({"prefixItems": [{}], "unevaluatedItems": False}, [1, 2], False),
    ({"items": {}, "unevaluatedItems": False}, [1, 2], True),
    ({"unevaluatedItems": {"minimum": 0}}, [1, -2], False),
    # contains covers ONLY the matched indices (applicator.py:235-250):
    # "a" is evaluated, "b" is not → unevaluatedItems:false fails
    ({"contains": {"const": "a"}, "unevaluatedItems": False}, ["a", "b"], False),
    ({"contains": {"const": "a"}, "unevaluatedItems": False}, ["a", "a"], True),
    (
        {"contains": {"const": "a"}, "unevaluatedItems": {"const": "b"}},
        ["a", "b", "a"],
        True,
    ),
    (
        {"contains": {"const": "a"}, "unevaluatedItems": {"const": "b"}},
        ["a", "c"],
        False,
    ),
    # prefixItems coverage inside a branch is gated on the branch guard:
    # the if fails on ["b"], so its prefixItems annotation is NOT collected
    (
        {"if": {"prefixItems": [{"const": "a"}]}, "unevaluatedItems": False},
        ["b"],
        False,
    ),
    (
        {"if": {"prefixItems": [{"const": "a"}]}, "unevaluatedItems": False},
        ["a"],
        True,
    ),
    # then-branch prefix coverage follows the if outcome
    (
        {
            "prefixItems": [{}],
            "if": {"prefixItems": [{"const": "a"}]},
            "then": {"prefixItems": [{}, {}]},
            "unevaluatedItems": False,
        },
        ["a", "x"],
        True,
    ),
    (
        {
            "prefixItems": [{}],
            "if": {"prefixItems": [{"const": "a"}]},
            "then": {"prefixItems": [{}, {}]},
            "unevaluatedItems": False,
        },
        ["b", "x"],
        False,
    ),
    # anyOf branch contains-coverage only from the succeeding branch
    (
        {
            "anyOf": [{"contains": {"const": "a"}}, {"contains": {"const": "z"}}],
            "unevaluatedItems": False,
        },
        ["a"],
        True,
    ),
    (
        {
            "anyOf": [{"contains": {"const": "a"}}, {"minItems": 1}],
            "unevaluatedItems": False,
        },
        ["q"],  # first branch fails; second covers nothing
        False,
    ),
]


@pytest.mark.parametrize(
    "block",
    [
        COMBINATOR_CASES,
        CONDITIONAL_CASES,
        DEPENDENT_CASES,
        ARRAY_APPLICATOR_CASES,
        OBJECT_APPLICATOR_CASES,
        REF_CASES,
        UNEVALUATED_CASES,
        NOT_COVERAGE_CASES,
        POSITIVE_NODE_PRUNE_CASES,
        OBJECT_SCOPED_SOURCE_CASES,
    ],
    ids=["combinators", "conditionals", "dependentSchemas", "arrays", "objects", "refs", "unevaluated", "not-coverage", "node-prune", "object-scoped-sources"],
)
def test_applicators(spark, block):
    for schema, data, valid in block:
        check_case(spark, schema, data, valid)


def test_node_prune_violation_sets(spark):
    """A failed /oneOf (double-match) or /allOf node prunes coverage, so
    the unevaluatedProperties violation ALSO appears — the reference
    reports both errors (verified live, jsonschema.py:518 pruning)."""
    from jschon_spark.testing import evaluate_instance

    for schema, data, _ in POSITIVE_NODE_PRUNE_CASES:
        valid, viols = evaluate_instance(spark, schema, data)
        assert not valid
        kw_paths = {v["keyword_path"] for v in viols}
        assert "/unevaluatedProperties" in kw_paths, (schema, sorted(kw_paths))


def test_format_annotate_vs_assert(spark):
    """format asserts only when enabled (jschon/vocabulary/format.py:14-32);
    built-in json-pointer validator ≙ jschon/formats.py:5-9."""
    check_case(spark, {"format": "ipv4"}, "999.1.1.1", True)  # annotate-only
    check_case(spark, {"format": "ipv4"}, "10.0.0.1", True, assert_formats=True)
    check_case(spark, {"format": "ipv4"}, "999.1.1.1", False, assert_formats=True)
    check_case(spark, {"format": "json-pointer"}, "/a/b~0c", True, assert_formats=True)
    check_case(spark, {"format": "json-pointer"}, "a", False, assert_formats=True)
    check_case(spark, {"format": "uuid"}, "123e4567-e89b-12d3-a456-426614174000", True, assert_formats=True)
    check_case(spark, {"format": "uuid"}, "nope", False, assert_formats=True)


def test_ref_cycle_raises(spark):
    """A tight $ref cycle exceeds the depth guard with a clear error
    (the reference would recurse at eval time; we fail at compile)."""
    import pytest as _pytest

    from jschon_spark.compiler import CompileError
    from jschon_spark.testing import evaluate_instance

    with _pytest.raises(CompileError):
        evaluate_instance(spark, {"$ref": "#"}, 1)


def test_unevaluated_properties_maptype(spark):
    """unevaluatedProperties over open MapType columns (dynamic key
    set): coverage by properties/patternProperties/additionalProperties
    per entry — applicator.py:333-365's map analogue."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jschon_spark.compiler import compile_schema

    dtype = T.MapType(T.StringType(), T.LongType())
    df = spark.createDataFrame(
        [
            Row(m={"a": 1, "b": 2}),
            Row(m={"a": 1, "x_extra": 3}),
            Row(m={"zz": 9}),
            Row(m=None),
        ],
        T.StructType([T.StructField("m", dtype, True)]),
    )

    def run(schema):
        c = compile_schema(schema).columns(dtype, F.col("m"))
        rows = df.select(F.col("m"), c.valid.alias("ok")).collect()
        return [r.ok for r in rows]

    # properties covers a/b; anything else is unevaluated
    s1 = {"properties": {"a": {}, "b": {}}, "unevaluatedProperties": False}
    assert run(s1) == [True, False, False, True]
    # patternProperties coverage
    s2 = {"properties": {"a": {}, "b": {}}, "patternProperties": {"^x_": {}}, "unevaluatedProperties": False}
    assert run(s2) == [True, True, False, True]
    # unevaluatedProperties with a subschema applies to uncovered entries
    s3 = {"properties": {"a": {}}, "unevaluatedProperties": {"maximum": 2}}
    assert run(s3) == [True, False, False, True]
    # additionalProperties in an allOf branch covers everything
    s4 = {"allOf": [{"additionalProperties": {}}], "unevaluatedProperties": False}
    assert run(s4) == [True, True, True, True]
    # conditional coverage: the then-branch's patternProperties only
    # cover when the if holds
    s5 = {
        "if": {"required": ["a"]},
        "then": {"patternProperties": {"": {}}},
        "unevaluatedProperties": False,
    }
    assert run(s5) == [True, True, False, True]


# nested/recursive annotation flow — suite-parity hard cases
NESTED_COVERAGE_CASES = [
    # annotations bubble up through nested combinators
    (
        {"allOf": [{"allOf": [{"prefixItems": [True]}]}], "unevaluatedItems": False},
        [1],
        True,
    ),
    (
        {"allOf": [{"allOf": [{"prefixItems": [True]}]}], "unevaluatedItems": False},
        [1, 2],
        False,
    ),
    (
        {
            "anyOf": [{"allOf": [{"properties": {"a": {}}}]}],
            "unevaluatedProperties": False,
        },
        {"a": 1},
        True,
    ),
    # a sibling branch's unevaluatedItems cannot see its cousins
    (
        {"allOf": [{"prefixItems": [True]}, {"unevaluatedItems": False}]},
        [1],
        False,
    ),
    # `not` never contributes annotations
    (
        {"not": {"not": {"prefixItems": [True]}}, "unevaluatedItems": False},
        [1],
        False,
    ),
    # dependentSchemas contributes coverage when the trigger is present
    (
        {
            "properties": {"foo": True},
            "dependentSchemas": {"foo": {"properties": {"bar": True}}},
            "unevaluatedProperties": False,
        },
        {"foo": 1, "bar": 2},
        True,
    ),
    (
        {
            "properties": {"foo": True},
            "dependentSchemas": {"foo": {"properties": {"bar": True}}},
            "unevaluatedProperties": False,
        },
        {"bar": 2},  # trigger absent → bar uncovered
        False,
    ),
    # if nested inside allOf: coverage follows both guards
    (
        {
            "allOf": [
                {
                    "if": {"prefixItems": [{"const": "a"}]},
                    "then": {"prefixItems": [True, True]},
                }
            ],
            "prefixItems": [True],
            "unevaluatedItems": False,
        },
        ["a", "x"],
        True,
    ),
    (
        {
            "allOf": [
                {
                    "if": {"prefixItems": [{"const": "a"}]},
                    "then": {"prefixItems": [True, True]},
                }
            ],
            "prefixItems": [True],
            "unevaluatedItems": False,
        },
        ["b", "x"],
        False,
    ),
]


def test_nested_coverage(spark):
    for schema, data, valid in NESTED_COVERAGE_CASES:
        check_case(spark, schema, data, valid)


# hard keyword-interaction cases (suite-parity batch 2)
INTERACTION_CASES = [
    # contains + min/maxContains (validation.py:180-208)
    ({"contains": {"minimum": 5}, "minContains": 2}, [5, 6, 1], True),
    ({"contains": {"minimum": 5}, "minContains": 2}, [5, 1, 1], False),
    ({"contains": {"minimum": 5}, "maxContains": 1}, [5, 6], False),
    ({"contains": {"minimum": 5}, "maxContains": 2}, [5, 6], True),
    ({"contains": {"minimum": 5}, "minContains": 0}, [1, 2], True),  # rescue
    ({"contains": {"minimum": 5}, "minContains": 0, "maxContains": 1}, [5, 6], False),
    # propertyNames interactions
    ({"propertyNames": {"pattern": "^[a-z]+$", "maxLength": 2}}, {"ab": 1}, True),
    ({"propertyNames": {"pattern": "^[a-z]+$", "maxLength": 2}}, {"abc": 1}, False),
    ({"propertyNames": False}, {}, True),
    ({"propertyNames": False}, {"a": 1}, False),
    # propertyNames does NOT cover properties for unevaluatedProperties
    ({"propertyNames": {"maxLength": 5}, "unevaluatedProperties": False}, {"ab": 1}, False),
    # dependentRequired + dependentSchemas, same trigger
    (
        {
            "dependentRequired": {"a": ["b"]},
            "dependentSchemas": {"a": {"properties": {"b": {"type": "integer"}}}},
        },
        {"a": 1, "b": 2},
        True,
    ),
    (
        {
            "dependentRequired": {"a": ["b"]},
            "dependentSchemas": {"a": {"properties": {"b": {"type": "integer"}}}},
        },
        {"a": 1, "b": "x"},
        False,
    ),
    # uniqueItems deep equality (json.py:277-289)
    ({"uniqueItems": True}, [[1], [2]], True),
    ({"uniqueItems": True}, [[1], [1]], False),
    ({"uniqueItems": True}, [{"a": 1}, {"a": 2}], True),
    ({"uniqueItems": True}, [{"a": 1}, {"a": 1}], False),
    # items:false forbids any items beyond the prefix
    ({"prefixItems": [{}], "items": False}, [1], True),
    ({"prefixItems": [{}], "items": False}, [1, 2], False),
    ({"items": False}, [], True),
    # enum against typed columns: non-representable members fold away
    ({"enum": [1, 2]}, 2, True),
    ({"enum": [1, 2]}, 3, False),
    ({"enum": ["x", "y"]}, "y", True),
    # const object with absent-field semantics (closed struct model)
    ({"properties": {"o": {"const": {"a": 1}}}}, {"o": {"a": 1}}, True),
    ({"properties": {"o": {"const": {"a": 1}}}}, {"o": {"a": 2}}, False),
    # pattern is a SEARCH, not a full match (validation.py:132-142)
    ({"pattern": "a"}, "xax", True),
    ({"pattern": "^a"}, "xa", False),
    # oneOf with overlapping branches at boundaries
    ({"oneOf": [{"maximum": 5}, {"minimum": 5}]}, 5, False),  # both
    ({"oneOf": [{"maximum": 4}, {"minimum": 6}]}, 5, False),  # neither
    ({"oneOf": [{"maximum": 4}, {"minimum": 5}]}, 5, True),
    # allOf of disjoint type gates: non-matching type passes vacuously
    ({"allOf": [{"type": "integer"}, {"minimum": 3}]}, 2, False),
    ({"allOf": [{"maxLength": 1}, {"minimum": 3}]}, 5, True),
    # nested not/anyOf
    ({"not": {"anyOf": [{"minimum": 5}, {"multipleOf": 2}]}}, 3, True),
    ({"not": {"anyOf": [{"minimum": 5}, {"multipleOf": 2}]}}, 4, False),
]


def test_keyword_interactions(spark):
    for schema, data, valid in INTERACTION_CASES:
        check_case(spark, schema, data, valid)


def test_pattern_properties_java_dialect_struct(spark):
    # Java-only regex in patternProperties over a STRUCT column: the
    # static name match falls back to the JVM dialect
    schema = {"patternProperties": {"^\\p{Alpha}+$": {"type": "integer"}}}
    check_case(spark, schema, {"abc": 1}, True)
    check_case(spark, schema, {"abc": "x"}, False)
    schema2 = {
        "properties": {"known": {}},
        "patternProperties": {"^x\\p{Digit}$": {}},
        "additionalProperties": False,
    }
    check_case(spark, schema2, {"known": 1, "x1": 2}, True)
    check_case(spark, schema2, {"known": 1, "y1": 2}, False)


def test_map_key_pointer_escaping(spark):
    """Dynamic map keys with '/' or '~' must be RFC 6901-escaped in
    violation instance paths (jschon/jsonpointer.py:257-273)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jschon_spark.compiler import compile_schema

    dtype = T.MapType(T.StringType(), T.LongType())
    df = spark.createDataFrame(
        [Row(m={"a/b": -1, "c~d": -2})],
        T.StructType([T.StructField("m", dtype, True)]),
    )
    c = compile_schema({"additionalProperties": {"minimum": 0}}).columns(dtype, F.col("m"))
    viols = df.select(c.viols.alias("v")).collect()[0].v
    paths = sorted(x.instance_path for x in viols)
    assert paths == ["/a~1b", "/c~0d"]


def test_ref_coverage_for_unevaluated(spark):
    """Annotations flow through $ref for unevaluated* coverage
    (applicator.py:190-232 consumes the ref'd subtree's annotations)."""
    s1 = {
        "$defs": {"t": {"prefixItems": [True]}},
        "$ref": "#/$defs/t",
        "unevaluatedItems": False,
    }
    check_case(spark, s1, [1], True)
    check_case(spark, s1, [1, 2], False)
    s2 = {
        "$defs": {"t": {"properties": {"a": {}}}},
        "$ref": "#/$defs/t",
        "unevaluatedProperties": False,
    }
    check_case(spark, s2, {"a": 1}, True)
    check_case(spark, s2, {"a": 1, "b": 2}, False)
    # boolean `then` contributes no annotations
    s3 = {
        "if": {"minItems": 0},
        "then": True,
        "unevaluatedItems": False,
    }
    check_case(spark, s3, [1], False)
    # additionalProperties: true in an allOf branch covers everything
    s4 = {"allOf": [{"additionalProperties": True}], "unevaluatedProperties": False}
    check_case(spark, s4, {"x": 1, "y": 2}, True)
