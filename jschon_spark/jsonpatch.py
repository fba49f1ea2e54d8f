"""RFC 6902 JSON Patch.

≙ the reference's ``JSONPatch``/``JSONPatchOperation``
(jschon/jsonpatch.py:24-331): the six operations — add, remove,
replace, move, copy, test — applied sequentially to a deep copy of the
document. The driver-side engine works on plain Python JSON values;
``patch_json_column`` lifts it over a Spark JSON-string column as an
Arrow-batched pandas_udf (rows whose payload fails to parse or whose
patch fails — e.g. a failing ``test`` — yield null, the columnar
analogue of the reference raising ``JSONPatchError``).
"""

from __future__ import annotations

import copy
import json
from typing import Any

import pandas as pd


class PatchError(Exception):
    """A patch operation cannot be applied (RFC 6902 error conditions)."""


def _unescape(token: str) -> str:
    return token.replace("~1", "/").replace("~0", "~")


def _split(pointer: str) -> list[str]:
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        raise PatchError(f"invalid JSON Pointer {pointer!r}")
    return [_unescape(t) for t in pointer[1:].split("/")]


def _walk_parent(doc: Any, pointer: str) -> tuple[Any, str]:
    """(parent container, final token). Raises if an intermediate
    segment does not resolve."""
    toks = _split(pointer)
    if not toks:
        raise PatchError("operation on the root document has no parent")
    node = doc
    for t in toks[:-1]:
        node = _step(node, t, pointer)
    return node, toks[-1]


def _step(node: Any, token: str, pointer: str) -> Any:
    if isinstance(node, dict):
        if token not in node:
            raise PatchError(f"pointer {pointer!r}: member {token!r} not found")
        return node[token]
    if isinstance(node, list):
        idx = _array_index(token, pointer, len(node), allow_end=False)
        return node[idx]
    raise PatchError(f"pointer {pointer!r}: cannot index into {type(node).__name__}")


def _array_index(token: str, pointer: str, length: int, allow_end: bool) -> int:
    if token == "-" and allow_end:
        return length
    if not token.isdigit() or (len(token) > 1 and token[0] == "0"):
        raise PatchError(f"pointer {pointer!r}: invalid array index {token!r}")
    idx = int(token)
    limit = length if allow_end else length - 1
    if idx > limit:
        raise PatchError(f"pointer {pointer!r}: index {idx} out of range")
    return idx


def get_value(doc: Any, pointer: str) -> Any:
    node = doc
    for t in _split(pointer):
        node = _step(node, t, pointer)
    return node


def _json_equal(a: Any, b: Any) -> bool:
    """Deep JSON equality (numbers compare cross-type, 1 == 1.0, but
    booleans are not numbers) — reference jschon/json.py:277-289."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_json_equal(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_json_equal(x, y) for x, y in zip(a, b))
    return type(a) is type(b) and a == b


def _op_add(doc: Any, path: str, value: Any) -> Any:
    if path == "":
        return value
    parent, tok = _walk_parent(doc, path)
    if isinstance(parent, dict):
        parent[tok] = value
    elif isinstance(parent, list):
        parent.insert(_array_index(tok, path, len(parent), allow_end=True), value)
    else:
        raise PatchError(f"add at {path!r}: parent is not a container")
    return doc


def _op_remove(doc: Any, path: str) -> Any:
    if path == "":
        # reference semantics: removing the root nulls the document
        # (jschon/jsonpatch.py:256-259 NodeType.ROOT -> None;
        # jschon/json.py:384-390 JSON.remove with an empty path), so a
        # subsequent `move` from "" round-trips like the reference too
        return None
    parent, tok = _walk_parent(doc, path)
    if isinstance(parent, dict):
        if tok not in parent:
            raise PatchError(f"remove at {path!r}: member not found")
        del parent[tok]
    elif isinstance(parent, list):
        del parent[_array_index(tok, path, len(parent), allow_end=False)]
    else:
        raise PatchError(f"remove at {path!r}: parent is not a container")
    return doc


def apply_op(doc: Any, op: dict) -> Any:
    """One RFC 6902 operation (mutates ``doc``; returns the new root —
    an ``add``/``replace`` at "" replaces the document wholesale)."""
    kind = op.get("op")
    path = op.get("path")
    if not isinstance(path, str):
        raise PatchError(f"operation missing 'path': {op!r}")
    if kind == "add":
        if "value" not in op:
            raise PatchError("'add' requires 'value'")
        return _op_add(doc, path, copy.deepcopy(op["value"]))
    if kind == "remove":
        return _op_remove(doc, path)
    if kind == "replace":
        if "value" not in op:
            raise PatchError("'replace' requires 'value'")
        get_value(doc, path)  # target must exist
        doc = _op_remove(doc, path) if path else doc
        return _op_add(doc, path, copy.deepcopy(op["value"]))
    if kind == "move":
        frm = op.get("from")
        if not isinstance(frm, str):
            raise PatchError("'move' requires 'from'")
        if path.startswith(frm + "/"):
            raise PatchError(f"cannot move {frm!r} into its own child {path!r}")
        value = get_value(doc, frm)
        doc = _op_remove(doc, frm)
        return _op_add(doc, path, value)
    if kind == "copy":
        frm = op.get("from")
        if not isinstance(frm, str):
            raise PatchError("'copy' requires 'from'")
        return _op_add(doc, path, copy.deepcopy(get_value(doc, frm)))
    if kind == "test":
        if "value" not in op:
            raise PatchError("'test' requires 'value'")
        actual = get_value(doc, path)
        if not _json_equal(actual, op["value"]):
            raise PatchError(f"test at {path!r} failed: {actual!r} != {op['value']!r}")
        return doc
    raise PatchError(f"unknown operation {kind!r}")


def apply_patch(doc: Any, ops: list[dict]) -> Any:
    """Apply a whole patch to a DEEP COPY (the input is untouched;
    reference jschon/jsonpatch.py:111-130)."""
    out = copy.deepcopy(doc)
    for op in ops:
        out = apply_op(out, op)
    return out


def patch_json_column(col, ops: list[dict]):
    """Column-level JSON Patch: ``json string -> json string`` over a
    static patch, Arrow-batched. Null in, unparseable payloads, and
    failed patches (failing ``test``, unresolvable paths) → null out."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def patch(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return json.dumps(
                    apply_patch(json.loads(v), ops), separators=(",", ":"), sort_keys=True
                )
            except (PatchError, ValueError):
                return None

        return s.map(one)

    return patch(col)


class JSONDocument:
    """In-place JSON mutation API — the driver-side counterpart of the
    reference's experimental ``JSON.add/remove/replace`` methods
    (jschon/json.py:327-459) plus the ``move``/``copy``/``test``
    methods the reference declares but leaves unimplemented
    (json.py:446-459); all six delegate to the same RFC 6902 engine as
    ``apply_patch``, so semantics match the patch operations exactly
    (e.g. an empty path replaces the document wholesale).

    This is a DRIVER-SIDE convenience for schema/catalog manipulation
    and tests; table-scale mutation is ``patch_json_column``. The
    wrapped value is plain Python JSON (dict/list/scalars), exposed via
    ``.value``."""

    def __init__(self, value: Any):
        self.value = copy.deepcopy(value)

    def add(self, path: str, value: Any) -> "JSONDocument":
        self.value = apply_op(self.value, {"op": "add", "path": path, "value": value})
        return self

    def remove(self, path: str) -> "JSONDocument":
        self.value = apply_op(self.value, {"op": "remove", "path": path})
        return self

    def replace(self, path: str, value: Any) -> "JSONDocument":
        self.value = apply_op(self.value, {"op": "replace", "path": path, "value": value})
        return self

    def move(self, from_: str, to: str) -> "JSONDocument":
        self.value = apply_op(self.value, {"op": "move", "from": from_, "path": to})
        return self

    def copy(self, from_: str, to: str) -> "JSONDocument":
        self.value = apply_op(self.value, {"op": "copy", "from": from_, "path": to})
        return self

    def test(self, path: str, value: Any) -> "JSONDocument":
        """Raises PatchError when the value at ``path`` differs (JSON
        equality: 1 == 1.0, key order ignored)."""
        apply_op(self.value, {"op": "test", "path": path, "value": value})
        return self

    def get(self, path: str) -> Any:
        return get_value(self.value, path)

    def patch(self, ops: list[dict]) -> "JSONDocument":
        """Apply a whole RFC 6902 patch atomically: either every op
        lands or (on any failure) the document is left untouched."""
        self.value = apply_patch(self.value, ops)
        return self

    def __eq__(self, other: Any) -> bool:
        ov = other.value if isinstance(other, JSONDocument) else other
        return _json_equal(self.value, ov)

    def __repr__(self) -> str:
        return f"JSONDocument({self.value!r})"
