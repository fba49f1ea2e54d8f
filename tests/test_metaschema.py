"""Metaschema validation + legacy-dialect rewriting.

≙ jschon's validate-before-use (jschon/jsonschema.py:187-189, catalog
self-check jschon/catalog/__init__.py:233-237) and the 2019-09 keyword
classes (jschon/vocabulary/legacy.py:15-151)."""

import pytest

from jschon_spark.compiler import compile_schema
from jschon_spark.compiler.core import CompileError
from jschon_spark.compiler.legacy import rewrite_legacy
from jschon_spark.compiler.metaschema import check_schema_document
from jschon_spark.testing import check_case

BAD_SCHEMAS = [
    ({"minimum": "five"}, "/minimum"),
    ({"type": "integr"}, "/type"),
    ({"type": ["integer", "integer"]}, "/type"),
    ({"maxLength": -1}, "/maxLength"),
    ({"maxLength": 2.5}, "/maxLength"),
    ({"multipleOf": 0}, "/multipleOf"),
    ({"pattern": "["}, "/pattern"),
    ({"required": ["a", "a"]}, "/required"),
    ({"required": "a"}, "/required"),
    ({"uniqueItems": "yes"}, "/uniqueItems"),
    ({"properties": {"a": 3}}, "/properties/a"),
    ({"properties": {"a": {"minimum": "x"}}}, "/properties/a/minimum"),
    ({"patternProperties": {"[": {}}}, "/patternProperties/["),
    ({"allOf": []}, "/allOf"),
    ({"allOf": [{"enum": 5}]}, "/allOf/0/enum"),
    ({"prefixItems": [{}, "nope"]}, "/prefixItems/1"),
    ({"dependentRequired": {"a": "b"}}, "/dependentRequired"),
    ({"$anchor": "9bad"}, "/$anchor"),
    ({"$ref": 3}, "/$ref"),
    ({"if": {"then": {"exclusiveMaximum": "x"}}}, "/if/then/exclusiveMaximum"),
]


@pytest.mark.parametrize("schema,path", BAD_SCHEMAS, ids=[p for _, p in BAD_SCHEMAS])
def test_bad_schema_rejected(schema, path):
    viols = check_schema_document(schema)
    assert any(v.path == path for v in viols), viols
    with pytest.raises(CompileError) as ei:
        compile_schema(schema)
    assert ei.value.violations
    assert path in str(ei.value)


def test_good_schemas_accepted():
    for s in [
        True,
        False,
        {},
        {"type": ["integer", "string"], "minimum": 3, "pattern": "^a+$"},
        {"properties": {"items": {"type": "array"}}, "unknownKeyword": 42},
        {"$defs": {"n": {"type": "number"}}, "$ref": "#/$defs/n"},
    ]:
        assert check_schema_document(s) == []


def test_validate_schema_opt_out():
    # garbage compiles to *something* when validation is disabled — the
    # opt-out exists for callers that pre-validate
    from jschon_spark.compiler.core import Compiler

    Compiler({"minimum": "five"}, validate_schema=False)


# -- legacy rewriting --------------------------------------------------------


def test_rewrite_tuple_items():
    src = {"items": [{"type": "integer"}, {"type": "string"}], "additionalItems": False}
    out = rewrite_legacy(src)
    assert out == {
        "prefixItems": [{"type": "integer"}, {"type": "string"}],
        "items": False,
        # marker for 2019-09 additionalItems discard semantics (the
        # rewritten `items` contributes nothing when tuple items fails);
        # inert unknown keyword in the 2020-12 pipeline
        "x-legacy-additionalItems": True,
    }
    # additionalItems without tuple items is dropped (legacy.py:113-121)
    assert rewrite_legacy({"items": {}, "additionalItems": False}) == {"items": {}}


def test_rewrite_shape_aware():
    # a property literally named "items"/"dependencies" is NOT rewritten
    src = {
        "properties": {
            "items": {"items": [{"type": "integer"}]},
            "dependencies": {"type": "object"},
        }
    }
    out = rewrite_legacy(src)
    assert set(out["properties"].keys()) == {"items", "dependencies"}
    assert out["properties"]["items"] == {"prefixItems": [{"type": "integer"}]}
    assert out["properties"]["dependencies"] == {"type": "object"}


def test_rewrite_dependencies_split():
    src = {"dependencies": {"a": ["b"], "c": {"required": ["d"]}}}
    assert rewrite_legacy(src) == {
        "dependentRequired": {"a": ["b"]},
        "dependentSchemas": {"c": {"required": ["d"]}},
    }


def test_legacy_tuple_items_end_to_end(spark):
    schema = {
        "properties": {
            "arr": {
                "items": [{"type": "integer", "minimum": 0}, {"const": 5}],
                "additionalItems": {"maximum": 10},
            }
        }
    }
    check_case(spark, schema, {"arr": [1, 5, 7]}, True)
    check_case(spark, schema, {"arr": [-1, 5]}, False)
    check_case(spark, schema, {"arr": [1, 4]}, False)
    check_case(spark, schema, {"arr": [1, 5, 11]}, False)


def test_legacy_recursive_ref_no_carrier(spark):
    # $recursiveRef:"#" with no $recursiveAnchor ≙ $ref:"#"
    schema = {
        "properties": {
            "v": {"type": "integer"},
            "child": {"$recursiveRef": "#"},
        }
    }
    check_case(spark, schema, {"v": 1, "child": {"v": 2, "child": None}}, True)
    check_case(spark, schema, {"v": 1, "child": {"v": 2.5, "child": None}}, False)


def test_schema_dialect_selection(spark):
    # known dialect URIs compile (all normalize to 2020-12)
    for uri in [
        "https://json-schema.org/draft/2020-12/schema",
        "https://json-schema.org/draft/2019-09/schema",
        "http://json-schema.org/draft-07/schema#",
    ]:
        compile_schema({"$schema": uri, "type": "integer"})
    with pytest.raises(CompileError, match="dialect"):
        compile_schema({"$schema": "https://example.com/my-dialect", "type": "integer"})
    # ...unless the catalog can resolve a WELL-FORMED custom metaschema
    # (validate-before-use like the reference's create_metaschema):
    from jschon_spark.compiler import SchemaCatalog

    cat = SchemaCatalog()
    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": "https://example.com/my-dialect",
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://json-schema.org/draft/2020-12/vocab/validation": True,
            },
        }
    )
    cat.compile({"$schema": "https://example.com/my-dialect", "type": "integer"})
    # a metaschema without $vocabulary refuses, like the reference on
    # tests/data/meta_no_vocabs.json ("No core vocabulary ... and no
    # default provided")
    cat.add_schema({
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "https://example.com/no-vocabs", "type": "object",
    })
    with pytest.raises(CompileError, match="core vocabulary"):
        cat.compile({"$schema": "https://example.com/no-vocabs", "type": "integer"})
    # ...and one that omits its own $schema refuses too ("The schema's
    # metaschema URI has not been set")
    cat.add_schema({
        "$id": "https://example.com/no-meta-uri",
        "$vocabulary": {"https://json-schema.org/draft/2020-12/vocab/core": True},
    })
    with pytest.raises(CompileError, match=r"\$schema"):
        cat.compile({"$schema": "https://example.com/no-meta-uri", "type": "integer"})


def test_vocabulary_driven_keyword_registry(spark):
    r"""A custom metaschema's $vocabulary decides which keywords assert
    (≙ jschon Metaschema.kwclasses, jschon/vocabulary/__init__.py:40-101):
    without the validation vocabulary, `minimum` is a mere annotation;
    an unknown REQUIRED vocabulary refuses to process (2020-12 §8.1.2);
    the format-assertion vocabulary turns format into an assertion."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jschon_spark.compiler import SchemaCatalog

    cat = SchemaCatalog()
    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": "https://ex.dev/meta/no-validation",
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://json-schema.org/draft/2020-12/vocab/applicator": True,
            },
        }
    )
    compiled = cat.compile({"$schema": "https://ex.dev/meta/no-validation", "minimum": 5})
    df = spark.range(1).select(F.lit(1).alias("v"))
    c = compiled.columns(T.IntegerType(), F.col("v"))
    assert df.select(c.valid.alias("ok")).collect()[0].ok is True  # minimum ignored

    # no core vocabulary at all: refused BEFORE the unknown-vocab check,
    # matching the reference's precedence ("Cannot determine unique
    # known core vocabulary", probed live)
    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": "https://ex.dev/meta/exotic",
            "$vocabulary": {"https://ex.dev/vocab/quantum": True},
        }
    )
    with pytest.raises(CompileError, match="core vocabulary"):
        cat.compile({"$schema": "https://ex.dev/meta/exotic", "type": "integer"})

    # core + REQUIRED unknown vocabulary: "requires an unrecognized
    # vocabulary" (2020-12 §8.1.2)
    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": "https://ex.dev/meta/core-plus-unknown",
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://ex.dev/vocab/quantum": True,
            },
        }
    )
    with pytest.raises(CompileError, match="unknown vocabulary"):
        cat.compile({"$schema": "https://ex.dev/meta/core-plus-unknown", "type": "integer"})

    # core + OPTIONAL unknown vocabulary: fine, and `type` is inert
    # (core-only keyword set — reference probe: valid(5) AND valid("x"))
    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": "https://ex.dev/meta/core-plus-optional-unknown",
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://ex.dev/vocab/quantum": False,
            },
        }
    )
    compiled = cat.compile(
        {"$schema": "https://ex.dev/meta/core-plus-optional-unknown", "type": "integer"}
    )
    c = compiled.columns(T.StringType(), F.lit("not an integer"))
    assert df.select(c.valid.alias("ok")).collect()[0].ok is True  # type inert

    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": "https://ex.dev/meta/strict-format",
            "$vocabulary": {
                "https://json-schema.org/draft/2020-12/vocab/core": True,
                "https://json-schema.org/draft/2020-12/vocab/validation": True,
                "https://json-schema.org/draft/2020-12/vocab/format-assertion": True,
            },
        }
    )
    compiled = cat.compile({"$schema": "https://ex.dev/meta/strict-format", "format": "ipv4"})
    c = compiled.columns(T.StringType(), F.lit("999.1.1.1"))
    assert df.select(c.valid.alias("ok")).collect()[0].ok is False  # format asserts


def test_draft04_exclusive_booleans(spark):
    # draft-04 boolean modifier form (reference supports via dialects)
    assert rewrite_legacy({"maximum": 10, "exclusiveMaximum": True}) == {"exclusiveMaximum": 10}
    assert rewrite_legacy({"maximum": 10, "exclusiveMaximum": False}) == {"maximum": 10}
    assert rewrite_legacy({"minimum": 0, "exclusiveMinimum": True}) == {"exclusiveMinimum": 0}
    check_case(spark, {"maximum": 10, "exclusiveMaximum": True}, 10, False)
    check_case(spark, {"maximum": 10, "exclusiveMaximum": False}, 10, True)


def test_mirrored_reference_invalid_schema():
    """Mirror of /root/reference/tests/test_output.py's schema_invalid
    fixture: all three metaschema violations must be reported with
    their pointer paths (prefixItems minItems, multipleOf type,
    multipleOf exclusiveMinimum)."""
    schema = {
        "$id": "http://example.com",
        "if": {"prefixItems": []},
        "then": {"contains": {"multipleOf": "2"}},
        "else": {"contains": {"multipleOf": -3}},
    }
    viols = check_schema_document(schema)
    paths = {v.path for v in viols}
    assert paths == {
        "/if/prefixItems",
        "/then/contains/multipleOf",
        "/else/contains/multipleOf",
    }
    with pytest.raises(CompileError) as ei:
        compile_schema(schema)
    assert len(ei.value.violations) == 3


def test_id_fragment_rules():
    # 2020-12: $id may end in an empty fragment but not carry a pointer
    # or anchor fragment (ref tests/test_vocabulary.py:39-74)
    assert check_schema_document({"$id": "http://ex.dev/x"}) == []
    assert check_schema_document({"$id": "http://ex.dev/x#"}) == []
    assert any(v.path == "/$id" for v in check_schema_document({"$id": "http://ex.dev/x#frag"}))
    assert any(v.path == "/$id" for v in check_schema_document({"$id": "http://ex.dev/x#/json/ptr"}))


def test_java_only_regex_accepted(spark):
    # runtime dialect is Java (rlike): \p{Alpha} must compile and run
    # even though Python re rejects it
    schema = {"pattern": "^\\p{Alpha}+$"}
    assert check_schema_document(schema) == []
    check_case(spark, schema, "abc", True)
    check_case(spark, schema, "ab1", False)
    # still flag patterns invalid in BOTH dialects
    assert any(v.path == "/pattern" for v in check_schema_document({"pattern": "["}))


def test_dependencies_merge_order():
    # explicit dependentSchemas AFTER legacy dependencies must merge,
    # not overwrite (and vice versa)
    out = rewrite_legacy(
        {"dependencies": {"a": {"minimum": 3}}, "dependentSchemas": {"b": {"type": "string"}}}
    )
    assert set(out["dependentSchemas"].keys()) == {"a", "b"}
    out2 = rewrite_legacy(
        {"dependentRequired": {"x": ["y"]}, "dependencies": {"a": ["b"]}}
    )
    assert set(out2["dependentRequired"].keys()) == {"x", "a"}


def test_2019_09_applicator_vocab_includes_unevaluated(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jschon_spark.compiler import SchemaCatalog

    cat = SchemaCatalog()
    cat.add_schema(
        {
            "$schema": "https://json-schema.org/draft/2019-09/schema",
            "$id": "https://ex.dev/meta/2019",
            "$vocabulary": {
                "https://json-schema.org/draft/2019-09/vocab/core": True,
                "https://json-schema.org/draft/2019-09/vocab/applicator": True,
                "https://json-schema.org/draft/2019-09/vocab/validation": True,
            },
        }
    )
    compiled = cat.compile(
        {
            "$schema": "https://ex.dev/meta/2019",
            "properties": {"a": {}},
            "unevaluatedProperties": False,
        }
    )
    dtype = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.LongType())])
    df = spark.createDataFrame([(1, 2)], dtype)
    c = compiled.columns(dtype, F.struct(F.col("a"), F.col("b")))
    # 'b' is unevaluated → must FAIL (the bug silently passed it)
    assert df.select(c.valid.alias("ok")).collect()[0].ok is False


def test_reference_metaschema_fixtures(spark):
    """The reference's own custom-metaschema fixtures
    (/root/reference/tests/data/meta_*.json, consumed by its
    tests/test_catalog.py:292-340), with the live-probed expectations:

    * meta_with_core: core-only vocabulary — compiles, and validation
      keywords are INERT (the reference evaluates both 5 and "ab" as
      valid under a type/minLength schema governed by it);
    * meta_invalid: refused — invalid against its own metaschema;
    * meta_no_vocabs: refused — no core vocabulary and no default.
    """
    import json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jschon_spark.compiler import SchemaCatalog

    data_dir = "/root/reference/tests/data"
    if not os.path.isdir(data_dir):  # pragma: no cover
        pytest.skip("reference test data not available")

    cat = SchemaCatalog()
    for name in ("meta_invalid", "meta_no_vocabs", "meta_with_core"):
        with open(os.path.join(data_dir, f"{name}.json")) as f:
            cat.add_schema(json.load(f), uri=f"https://example.com/{name}")

    compiled = cat.compile(
        {
            "$schema": "https://example.com/meta_with_core",
            "$id": "https://example.com/uses-core-only",
            "type": "string",
            "minLength": 100,
        }
    )
    df = spark.range(1)
    ok_int = df.select(compiled.columns(T.IntegerType(), F.lit(5)).valid.alias("ok"))
    ok_str = df.select(compiled.columns(T.StringType(), F.lit("ab")).valid.alias("ok"))
    assert ok_int.collect()[0].ok is True
    assert ok_str.collect()[0].ok is True

    with pytest.raises(CompileError, match="invalid against its own metaschema"):
        cat.compile(
            {"$schema": "https://example.com/meta_invalid", "type": "string"}
        )
    with pytest.raises(CompileError, match="core vocabulary"):
        cat.compile(
            {"$schema": "https://example.com/meta_no_vocabs", "type": "string"}
        )
