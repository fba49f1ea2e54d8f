"""Property-based keyword tests against independent Python oracles.

Mirrors the reference's hypothesis suite (tests/test_validators.py:
type :32-50, multipleOf-vs-Decimal :65-71, uniqueItems-vs-quadratic
:128-138) — but each hypothesis example is a BATCH of values evaluated
in one DataFrame pass, so the property runs a handful of Spark jobs,
not one per value.
"""

import re
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jschon_spark.compiler import compile_schema

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def batch_valid(spark, schema, values, dtype):
    df = spark.createDataFrame(
        [Row(value=v) for v in values], T.StructType([T.StructField("value", dtype, True)])
    )
    c = compile_schema(schema).columns(dtype, F.col("value"))
    return [bool(r[0]) for r in df.select(c.valid).collect()]


@settings(**SETTINGS)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=50), st.integers(0, 20))
def test_length_bounds_oracle(spark, texts, bound):
    got = batch_valid(spark, {"maxLength": bound}, texts, T.StringType())
    assert got == [len(t) <= bound for t in texts]
    got = batch_valid(spark, {"minLength": bound}, texts, T.StringType())
    assert got == [len(t) >= bound for t in texts]


@settings(**SETTINGS)
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 3)),
        min_size=1,
        max_size=50,
    ),
    st.floats(-100, 100, allow_nan=False).map(lambda x: round(x, 3)),
)
def test_numeric_bounds_oracle(spark, xs, bound):
    got = batch_valid(spark, {"maximum": bound}, xs, T.DoubleType())
    assert got == [x <= bound for x in xs]
    got = batch_valid(spark, {"exclusiveMinimum": bound}, xs, T.DoubleType())
    assert got == [x > bound for x in xs]


@settings(**SETTINGS)
@given(
    st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=50),
    st.integers(1, 1000),
)
def test_multiple_of_integer_oracle(spark, xs, div):
    got = batch_valid(spark, {"multipleOf": div}, xs, T.LongType())
    # reference converts through Decimal (validation.py:66-75)
    assert got == [Decimal(x) % Decimal(div) == 0 for x in xs]


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(-5, 5), max_size=8), min_size=1, max_size=30
    )
)
def test_unique_items_quadratic_oracle(spark, arrays):
    got = batch_valid(
        spark, {"uniqueItems": True}, arrays, T.ArrayType(T.LongType(), True)
    )

    def oracle(arr):  # quadratic dedup, as test_validators.py:128-138
        for i in range(len(arr)):
            for j in range(i + 1, len(arr)):
                if arr[i] == arr[j]:
                    return False
        return True

    assert got == [oracle(a) for a in arrays]


@settings(**SETTINGS)
@given(st.lists(st.from_regex(r"[a-z0-9.-]{0,12}", fullmatch=True), min_size=1, max_size=50))
def test_pattern_oracle(spark, texts):
    pattern = "^[a-z]+[0-9]$"
    got = batch_valid(spark, {"pattern": pattern}, texts, T.StringType())
    # unanchored re.search semantics (validation.py:132-142); this
    # pattern is ASCII-only so the Java/Python dialects agree
    assert got == [re.search(pattern, t) is not None for t in texts]


@settings(**SETTINGS)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "zz"]), min_size=1, max_size=50),
    st.sets(st.sampled_from(["a", "b", "c"]), min_size=1),
)
def test_enum_oracle(spark, values, enum):
    got = batch_valid(spark, {"enum": sorted(enum)}, values, T.StringType())
    assert got == [v in enum for v in values]


@settings(**SETTINGS)
@given(
    st.lists(st.lists(st.integers(0, 9), max_size=6), min_size=1, max_size=30),
    st.integers(0, 5),
)
def test_items_bounds_oracle(spark, arrays, k):
    got = batch_valid(spark, {"maxItems": k}, arrays, T.ArrayType(T.LongType(), True))
    assert got == [len(a) <= k for a in arrays]
    schema = {"items": {"maximum": 5}}
    got = batch_valid(spark, schema, arrays, T.ArrayType(T.LongType(), True))
    assert got == [all(x <= 5 for x in a) for a in arrays]


# -- round-2 components: driver-side, no Spark session needed ---------------

json_values = st.recursive(
    st.none() | st.booleans() | st.integers(-100, 100) | st.text(max_size=8),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=6), children, max_size=4),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_legacy_rewrite_idempotent(doc):
    """rewrite_legacy is idempotent, and its output never contains a
    legacy spelling in a schema position."""
    from jschon_spark.compiler.legacy import rewrite_legacy

    once = rewrite_legacy(doc)
    assert rewrite_legacy(once) == once


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_metaschema_checker_total(doc):
    """check_schema_document never raises on arbitrary JSON input — it
    reports violations, it doesn't crash (the whole point: garbage in,
    structured error out)."""
    from jschon_spark.compiler.metaschema import check_schema_document

    viols = check_schema_document(doc)
    for v in viols:
        assert isinstance(v.path, str) and isinstance(v.message, str)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "op": st.sampled_from(["add", "remove", "replace", "test"]),
                "path": st.sampled_from(["", "/a", "/a/b", "/b", "/xs/0", "/xs/-"]),
            },
            optional={"value": st.integers(-5, 5)},
        ),
        max_size=5,
    )
)
def test_jsonpatch_total_and_pure(ops):
    """apply_patch either succeeds or raises PatchError (never another
    exception), and NEVER mutates its input document."""
    import copy

    from jschon_spark.jsonpatch import PatchError, apply_patch

    doc = {"a": {"b": 1}, "xs": [1, 2]}
    snapshot = copy.deepcopy(doc)
    try:
        apply_patch(doc, ops)
    except PatchError:
        pass
    assert doc == snapshot
