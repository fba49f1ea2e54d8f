"""RFC 6902 JSON Patch (reference jschon/jsonpatch.py:24-331).
Cases mirror the RFC's appendix A examples."""

import pytest

from jschon_spark.jsonpatch import PatchError, apply_patch, patch_json_column

A = {"foo": "bar"}


def test_rfc_appendix_examples():
    # A.1 add object member
    assert apply_patch({"foo": "bar"}, [{"op": "add", "path": "/baz", "value": "qux"}]) == {
        "foo": "bar",
        "baz": "qux",
    }
    # A.2 add array element
    assert apply_patch({"foo": ["bar", "baz"]}, [{"op": "add", "path": "/foo/1", "value": "qux"}]) == {
        "foo": ["bar", "qux", "baz"]
    }
    # A.3 remove object member
    assert apply_patch({"baz": "qux", "foo": "bar"}, [{"op": "remove", "path": "/baz"}]) == {
        "foo": "bar"
    }
    # A.4 remove array element
    assert apply_patch({"foo": ["bar", "qux", "baz"]}, [{"op": "remove", "path": "/foo/1"}]) == {
        "foo": ["bar", "baz"]
    }
    # A.5 replace
    assert apply_patch({"baz": "qux", "foo": "bar"}, [{"op": "replace", "path": "/baz", "value": "boo"}]) == {
        "baz": "boo",
        "foo": "bar",
    }
    # A.6 move
    assert apply_patch(
        {"foo": {"bar": "baz", "waldo": "fred"}, "qux": {"corge": "grault"}},
        [{"op": "move", "from": "/foo/waldo", "path": "/qux/thud"}],
    ) == {"foo": {"bar": "baz"}, "qux": {"corge": "grault", "thud": "fred"}}
    # A.7 move array element
    assert apply_patch(
        {"foo": ["all", "grass", "cows", "eat"]},
        [{"op": "move", "from": "/foo/1", "path": "/foo/3"}],
    ) == {"foo": ["all", "cows", "eat", "grass"]}
    # A.8 test success
    apply_patch(
        {"baz": "qux", "foo": ["a", 2, "c"]},
        [{"op": "test", "path": "/baz", "value": "qux"}, {"op": "test", "path": "/foo/1", "value": 2}],
    )
    # A.9 test failure
    with pytest.raises(PatchError):
        apply_patch({"baz": "qux"}, [{"op": "test", "path": "/baz", "value": "bar"}])
    # A.10 nested add
    assert apply_patch(
        {"foo": "bar"}, [{"op": "add", "path": "/child", "value": {"grandchild": {}}}]
    ) == {"foo": "bar", "child": {"grandchild": {}}}
    # A.12 missing target for add
    with pytest.raises(PatchError):
        apply_patch({"foo": "bar"}, [{"op": "add", "path": "/baz/bat", "value": "qux"}])
    # A.14 ~ escape ordering
    assert apply_patch({"/": 9, "~1": 10}, [{"op": "test", "path": "/~01", "value": 10}]) == {
        "/": 9,
        "~1": 10,
    }
    # A.16 add to end of array with "-"
    assert apply_patch(
        {"foo": ["bar"]}, [{"op": "add", "path": "/foo/-", "value": ["abc", "def"]}]
    ) == {"foo": ["bar", ["abc", "def"]]}


def test_edge_semantics():
    # root replace
    assert apply_patch({"a": 1}, [{"op": "add", "path": "", "value": [1]}]) == [1]
    # remove missing member / bad index
    with pytest.raises(PatchError):
        apply_patch({"a": 1}, [{"op": "remove", "path": "/b"}])
    with pytest.raises(PatchError):
        apply_patch([1, 2], [{"op": "add", "path": "/5", "value": 0}])
    with pytest.raises(PatchError):
        apply_patch([1, 2], [{"op": "add", "path": "/01", "value": 0}])
    # move into own child refused
    with pytest.raises(PatchError):
        apply_patch({"a": {"b": {}}}, [{"op": "move", "from": "/a", "path": "/a/b/c"}])
    # input untouched (deep copy)
    src = {"a": [1, 2]}
    apply_patch(src, [{"op": "remove", "path": "/a/0"}])
    assert src == {"a": [1, 2]}
    # booleans are not numbers in test equality
    with pytest.raises(PatchError):
        apply_patch({"a": True}, [{"op": "test", "path": "/a", "value": 1}])
    apply_patch({"a": 1.0}, [{"op": "test", "path": "/a", "value": 1}])  # 1 == 1.0


def test_patch_json_column(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(j='{"k": 1, "old": true}'), Row(j='{"k": 99}'), Row(j="not json"), Row(j=None)],
        "j string",
    )
    ops = [
        {"op": "test", "path": "/k", "value": 1},
        {"op": "remove", "path": "/old"},
        {"op": "add", "path": "/v", "value": 2},
    ]
    out = [r.p for r in df.select(patch_json_column(F.col("j"), ops).alias("p")).collect()]
    assert out[0] == '{"k":1,"v":2}'
    assert out[1] is None  # test failed
    assert out[2] is None  # unparseable
    assert out[3] is None  # null payload
