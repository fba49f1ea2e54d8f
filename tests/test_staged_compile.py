"""Staged materialization of deeply nested schemas (round-4 fix).

Round 3's one real defect: Catalyst analysis expands the shared Column
DAG into a tree, and because every node's viols channel re-references
its children's `valid` trees, materialized size grew ~2x per NESTING
level — a ~600-node compile of a 7+-level-nested schema (fuzz seeds
main 5069 / ext 5088) exhausted a 12 GB driver heap at `.select()`.
The fix (core.py staged materialization): row-scope subschema nodes
whose subtree weight reaches ``stage_threshold`` spill their
valid/viols/cond channels into numbered stage dicts that consumers
replay as successive ``withColumns`` projections, so analysis sees
bounded expressions over named attribute refs. Both fuzz seeds now run
clean against the in-sandbox reference (campaign `ok`, 40 instances
each); this module pins the nested shape as a fast regression.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from jschon_spark.compiler import compile_schema
from jschon_spark.testing import evaluate_batch


def _nested(n: int) -> dict:
    """The OOM shape: each level layers oneOf + if/then + allOf over an
    object whose property carries the next level (≙ fuzz gen_root_schema
    nesting, tests/test_fuzz_parity.py)."""
    if n == 0:
        return {"type": "integer", "minimum": 0, "maximum": 100}
    return {
        "type": "object",
        "required": ["a"],
        "properties": {"a": _nested(n - 1), "b": {"type": "string", "minLength": 1}},
        "oneOf": [
            {"properties": {"b": {"pattern": "^x"}}},
            {"properties": {"b": {"pattern": "^y"}}, "required": ["b"]},
        ],
        "if": {"required": ["b"]},
        "then": {"properties": {"b": {"maxLength": 10}}},
        "allOf": [{"properties": {"a": {}}}, {"minProperties": 1}],
    }


def _instance(n: int, good: bool = True):
    if n == 0:
        return 50 if good else -5
    return {"a": _instance(n - 1, good), "b": "xhello"}


def test_deep_nested_schema_compiles_and_evaluates(spark):
    """9 levels of oneOf/allOf/if nesting — 2 levels past the round-3
    OOM threshold — must compile, evaluate, and agree on verdicts.
    Violations from the failing leaf must surface with the full
    instance path."""
    schema = _nested(9)
    res = evaluate_batch(
        spark, schema, [_instance(9, True), _instance(9, False)], with_violations=True
    )
    assert res[0][0] is True and res[0][1] == []
    valid, viols = res[1]
    assert valid is False
    paths = {v["instance_path"] for v in viols}
    assert "/a/a/a/a/a/a/a/a/a" in paths  # the deep failing leaf
    assert any(v["keyword"] == "minimum" for v in viols)


def test_staging_spills_intermediate_columns(spark):
    """The staged path actually engages for the nested shape (stages
    non-empty, stage-k expressions reference only earlier temps), and
    bare ``columns()`` stays standalone (no stray F.col temps that the
    caller's select couldn't resolve)."""
    schema = _nested(4)

    def dt(n):
        if n == 0:
            return T.LongType()
        return T.StructType(
            [T.StructField("a", dt(n - 1), True), T.StructField("b", T.StringType(), True)]
        )

    dtype = T.StructType([T.StructField("v", dt(4), True)])
    compiled = compile_schema(schema)
    c, stages = compiled.columns_staged(dt(4), F.col("v"))
    assert sum(len(s) for s in stages) > 0, "deep schema should spill stages"

    # bare columns(): no staging — the Columns must select standalone
    row = {"a": {"a": {"a": {"a": 7, "b": "x"}, "b": "x"}, "b": "x"}, "b": "x"}
    df = spark.createDataFrame([(row,)], dtype)
    c2 = compiled.columns(dt(4), F.col("v"))
    assert compiled.compiler.stages == [] or not any(compiled.compiler.stages)
    got = df.select(c2.valid.alias("ok")).collect()[0]
    assert got["ok"] is True


def test_staged_and_unstaged_agree(spark):
    """Same schema, same instances: validate() (staged) and a direct
    columns() select (unstaged) must produce identical valid/viols."""
    schema = _nested(3)
    rows = [
        {"a": {"a": {"a": 5, "b": "xq"}, "b": "x"}, "b": "x"},
        {"a": {"a": {"a": -1, "b": "xq"}, "b": "x"}, "b": "x"},
        {"a": {"a": {"a": 5, "b": "zzz"}, "b": "x"}, "b": "x"},
    ]

    def dt(n):
        if n == 0:
            return T.LongType()
        return T.StructType(
            [T.StructField("a", dt(n - 1), True), T.StructField("b", T.StringType(), True)]
        )

    dtype = T.StructType([T.StructField("v", dt(3), True)])
    df = spark.createDataFrame([(r,) for r in rows], dtype)
    compiled = compile_schema(schema)

    # validate() roots the instance at the struct-of-columns {"v": ...},
    # so wrap the schema the same way for both sides; the unstaged side
    # applies columns() over an identical root struct.
    wrapped = {"type": "object", "required": ["v"], "properties": {"v": schema}}
    wdtype = T.StructType([T.StructField("v", dt(3), True)])
    compiled_w = compile_schema(wrapped)
    staged = compiled_w.validate(df, instance_columns=["v"]).select("valid", "violations")
    c = compiled_w.columns(wdtype, F.struct(F.col("v").alias("v")))
    plain = df.select(c.valid.alias("valid"), c.viols.alias("violations"))
    got_s = [(r["valid"], sorted((v["keyword"], v["instance_path"]) for v in r["violations"]))
             for r in staged.collect()]
    got_p = [(r["valid"], sorted((v["keyword"], v["instance_path"]) for v in r["violations"]))
             for r in plain.collect()]
    assert got_s == got_p
    assert got_s[0][0] is True and got_s[1][0] is False and got_s[2][0] is False


def test_stage_columns_dropped_from_validate_output(spark):
    schema = _nested(4)

    def dt(n):
        if n == 0:
            return T.LongType()
        return T.StructType(
            [T.StructField("a", dt(n - 1), True), T.StructField("b", T.StringType(), True)]
        )

    dtype = T.StructType([T.StructField("v", dt(4), True)])
    df = spark.createDataFrame(
        [({"a": {"a": {"a": {"a": 7, "b": "x"}, "b": "x"}, "b": "x"}, "b": "x"},)], dtype
    )
    out = compile_schema(schema).validate(df, instance_columns=["v"])
    assert not [c for c in out.columns if c.startswith("__jsv")]
    assert out.columns == ["v", "valid", "violations"]
