import pytest
from jschon_spark.jsonpatch import JSONDocument, PatchError


def test_mutation_roundtrip():
    d = JSONDocument({"a": [1, 2], "b": {"c": 3}})
    d.add("/a/1", 9).replace("/b/c", 4).remove("/a/0")
    assert d.value == {"a": [9, 2], "b": {"c": 4}}
    d.move("/b/c", "/top").copy("/top", "/b/c2")
    assert d.value == {"a": [9, 2], "b": {"c2": 4}, "top": 4}
    d.test("/top", 4.0)  # JSON equality
    with pytest.raises(PatchError):
        d.test("/top", 5)
    assert d.get("/a/1") == 2


def test_whole_document_replace_and_atomic_patch():
    d = JSONDocument([1])
    d.replace("", {"x": 1})
    assert d.value == {"x": 1}
    with pytest.raises(PatchError):
        d.patch([{"op": "add", "path": "/y", "value": 2}, {"op": "remove", "path": "/nope"}])
    assert d.value == {"x": 1}  # untouched on failure


def test_input_not_aliased():
    src = {"k": [1]}
    d = JSONDocument(src)
    d.add("/k/-", 2)
    assert src == {"k": [1]}


def test_equality():
    assert JSONDocument({"a": 1}) == {"a": 1.0}
    assert not (JSONDocument({"a": 1}) == {"a": 2})
