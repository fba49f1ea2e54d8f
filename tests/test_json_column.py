"""Schema-derived typing + validation of dynamic JSON-string columns.

The reference accepts any JSON shape at runtime (jschon/json.py:120-151);
here the shape is pinned by deriving the Spark type from the schema and
parsing with from_json (SURVEY.md §1.4 JSON-column row).
"""

import pandas as pd
import pytest
from pyspark.sql import types as T

from jschon_spark.compiler import (
    SchemaDerivationError,
    spark_schema_for,
    validate_json_column,
)

SCHEMA = {
    "type": "object",
    "required": ["k", "tag"],
    "properties": {
        "k": {"type": "integer", "minimum": 0, "maximum": 100},
        "tag": {"type": "string", "pattern": "^[a-z]+$"},
        "opts": {"type": "array", "items": {"type": "integer"}},
    },
}


def test_spark_schema_for_shapes():
    st = spark_schema_for(SCHEMA)
    assert isinstance(st, T.StructType)
    assert st["k"].dataType == T.LongType()
    assert st["tag"].dataType == T.StringType()
    assert st["opts"].dataType == T.ArrayType(T.LongType())

    assert spark_schema_for({"enum": ["a", "b"]}) == T.StringType()
    assert spark_schema_for({"const": 3}) == T.LongType()
    assert spark_schema_for({"type": ["integer", "null"]}) == T.LongType()
    assert spark_schema_for(
        {"type": "object", "additionalProperties": {"type": "number"}}
    ) == T.MapType(T.StringType(), T.DoubleType())
    assert spark_schema_for(
        {"$defs": {"n": {"type": "number"}}, "$ref": "#/$defs/n"}
    ) == T.DoubleType()
    assert spark_schema_for(
        {
            "allOf": [
                {"type": "object", "properties": {"a": {"type": "integer"}}},
                {"properties": {"b": {"type": "string"}}},
            ]
        }
    ) == T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )


def test_spark_schema_for_rejects_open_shapes():
    with pytest.raises(SchemaDerivationError):
        spark_schema_for(True)
    with pytest.raises(SchemaDerivationError):
        spark_schema_for({"type": ["integer", "string"]})
    with pytest.raises(SchemaDerivationError):
        spark_schema_for({"minimum": 3})


def test_validate_json_column(spark):
    rows = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "payload": [
                '{"k": 5, "tag": "ok"}',
                '{"k": 200, "tag": "ok"}',          # maximum violation
                '{"k": 5, "tag": "NOPE"}',          # pattern violation
                '{"tag": "ok"}',                    # required k missing
                "{not json",                        # parse failure
                None,                               # null payload
            ],
        }
    )
    df = spark.createDataFrame(rows, schema="id long, payload string")
    out = (
        validate_json_column(df, SCHEMA, "payload")
        .select("id", "valid", "violations")
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert bool(out.loc[1, "valid"])
    assert not out.loc[2, "valid"]
    assert {v["keyword"] for v in out.loc[2, "violations"]} == {"maximum"}
    assert {v["keyword"] for v in out.loc[3, "violations"]} == {"pattern"}
    assert {v["keyword"] for v in out.loc[4, "violations"]} == {"required"}
    assert {v["keyword"] for v in out.loc[5, "violations"]} == {"jsonParse"}
    # null payload = the JSON null instance: fails `type: object` itself
    # (reference jschon/vocabulary/validation.py:33-46), while the
    # object-gated keywords (required/properties) are skipped
    assert not out.loc[6, "valid"]
    assert {v["keyword"] for v in out.loc[6, "violations"]} == {"type"}


def test_validate_json_column_null_payload_untyped_schema(spark):
    # without a `type` keyword a null instance passes vacuously —
    # required/properties are gated on the object type
    schema = {"required": ["k"], "properties": {"k": {"type": "integer"}}}
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [None]}), schema="id long, payload string"
    )
    out = validate_json_column(df, schema, "payload").select("valid").collect()
    assert out[0][0] is True


def test_validate_json_column_instance_paths(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": ['{"k": -3, "tag": "ok"}']}),
        schema="id long, payload string",
    )
    out = validate_json_column(df, SCHEMA, "payload").select("violations").collect()
    v = out[0][0][0]
    assert v["instance_path"] == "/k"
    assert v["keyword"] == "minimum"
    assert "/properties/k/minimum" in v["keyword_path"]


def test_heterogeneous_prefix_items_raises():
    # ADVICE: prefixItems [integer, string] must raise, not silently
    # derive ArrayType(Long) and null out the string elements
    import pytest

    from jschon_spark.compiler.spark_schema import SchemaDerivationError, spark_schema_for

    with pytest.raises(SchemaDerivationError, match="heterogeneous"):
        spark_schema_for(
            {"type": "array", "prefixItems": [{"type": "integer"}, {"type": "string"}]}
        )
    with pytest.raises(SchemaDerivationError, match="heterogeneous"):
        spark_schema_for(
            {"type": "array", "items": {"type": "number"}, "prefixItems": [{"type": "string"}]}
        )
    # agreeing entries still derive
    import pyspark.sql.types as T

    assert spark_schema_for(
        {"type": "array", "prefixItems": [{"type": "integer"}, {"type": "integer"}]}
    ) == T.ArrayType(T.LongType())


def test_catalog_path_traversal_rejected(tmp_path):
    import json as _json

    from jschon_spark.compiler import SchemaCatalog

    inner = tmp_path / "schemas"
    inner.mkdir()
    (tmp_path / "secret.json").write_text(_json.dumps({"type": "integer"}))
    cat = SchemaCatalog()
    cat.add_directory_source("https://ex.dev/s/", str(inner))
    assert cat.lookup("https://ex.dev/s/../secret") is None


def test_catalog_unhashable_kwargs_skip_cache(tmp_path):
    import json as _json

    from jschon_spark.compiler import SchemaCatalog

    (tmp_path / "m.json").write_text(_json.dumps({"$id": "https://ex.dev/c/m", "type": "number"}))
    cat = SchemaCatalog()
    cat.add_directory_source("https://ex.dev/c/", str(tmp_path))
    # dict-valued kwarg used to raise TypeError from the cache key
    c1 = cat.compile("https://ex.dev/c/m", format_validators={})
    c2 = cat.compile("https://ex.dev/c/m", format_validators={})
    assert c1 is not c2  # uncached, but works
