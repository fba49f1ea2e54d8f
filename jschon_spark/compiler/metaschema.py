"""Metaschema validation of input schema documents.

jschon validates every schema against its metaschema before use
(jschon/jsonschema.py:187-189 ``validate()``; catalog self-check at
jschon/catalog/__init__.py:233-237) and raises ``JSONSchemaError`` on
garbage like ``{"minimum": "five"}``. This module re-expresses the
2020-12 metaschema's per-keyword constraints as driver-side structural
checks — the schema document is a small Python dict on the driver, so
no Spark job is needed — and reports EVERY violation with its
JSON-Pointer path, mirroring the ``basic`` output unit.

The checks follow the 2020-12 vocabulary metaschemas
(meta/validation, meta/applicator, meta/core), which jschon ships at
jschon/catalog/json-schema-2020-12/.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from jschon_spark.compiler.context import escape_pointer

_JSON_TYPES = {"null", "boolean", "object", "array", "number", "integer", "string"}

_ANCHOR_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9._-]*$")

# keywords whose value is a single subschema
_SUBSCHEMA_KWS = (
    "additionalProperties",
    "items",
    "contains",
    "not",
    "if",
    "then",
    "else",
    "propertyNames",
    "unevaluatedItems",
    "unevaluatedProperties",
    "contentSchema",
)
# keywords whose value is a non-empty array of subschemas
_SUBSCHEMA_ARRAY_KWS = ("prefixItems", "allOf", "anyOf", "oneOf")
# keywords whose value is an object of subschemas
_SUBSCHEMA_OBJECT_KWS = ("properties", "patternProperties", "dependentSchemas", "$defs", "definitions")


@dataclass(frozen=True)
class SchemaViolation:
    path: str  # JSON Pointer into the schema document
    keyword: str
    message: str

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"{self.path or '/'}: {self.message}"


def _is_schema(v: Any) -> bool:
    return isinstance(v, (bool, dict))


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _is_nonneg_int(v: Any) -> bool:
    # JSON Schema "integer" includes numbers with a zero fractional part
    # (2020-12 §6.1.1; suite: maxContains 1.0) — mirror that here
    if isinstance(v, bool):
        return False
    if isinstance(v, int):
        return v >= 0
    return isinstance(v, float) and v.is_integer() and v >= 0


# constructs valid in Java regex (the runtime dialect — rlike) but not
# in Python re: \p{...}/\P{...} property classes, possessive
# quantifiers (a*+, a++, a?+, a{n,m}+), \Q...\E literal quoting, and
# \cX control-character escapes
_JAVA_ONLY_RE = re.compile(r"\\[pP]\{|[*+?}]\+|\\[QE]|\\c[A-Za-z]")

# constructs Python re accepts but the JVM rejects — these would pass a
# plain re.compile vet and then blow up the JOB at the first rlike
# execution: Python-spelled named groups/backrefs and conditionals
_PY_ONLY_RE = re.compile(r"\(\?P[<=]|\(\?\(")

_PROP_NAME_RE = re.compile(r"\\[pP]\{([^}]*)\}")
# \p{NAME} names the JVM accepts (java.util.regex.Pattern): one- or
# two-letter Unicode general categories, the POSIX-ish classes, java*
# method names, In<block> / Is<script-or-binary-property>, and the
# explicit gc=/sc=/blk= forms. Anything else (e.g. ECMA-2018's
# \p{Letter} or lowercase \p{digit}) raises at runtime, so the vet
# must reject it at compile time (round-4 probe: \p{Letter} compiled
# fine and then killed the collect job).
_POSIX_CLASSES = frozenset(
    "Lower Upper ASCII Alpha Digit Alnum Punct Graph Print Blank Cntrl XDigit Space".split()
)
_GC_RE = re.compile(r"^[LMNPSZC][a-zA-Z]?$")


def _java_prop_ok(name: str) -> bool:
    return bool(
        _GC_RE.match(name)
        or name in _POSIX_CLASSES
        or name.startswith("java")
        or name.startswith("In")
        or name.startswith("Is")
        or "=" in name
    )


def _valid_regex(v: Any) -> bool:
    """Is the value usable as a pattern AT RUNTIME? The runtime keyword
    compiles on the JVM (Java dialect, core.py _k_pattern rlike), so a
    pattern Python's re rejects is only a violation when it uses no
    Java-only construct — otherwise we must not reject a schema the
    engine would run fine. Conversely, Python-only spellings and
    JVM-unknown \\p{...} property names are rejected here even though
    re.compile likes them, because rlike would fail mid-job."""
    if not isinstance(v, str):
        return False
    if _PY_ONLY_RE.search(v):
        return False
    if not all(_java_prop_ok(m.group(1)) for m in _PROP_NAME_RE.finditer(v)):
        return False
    try:
        re.compile(v)
        return True
    except re.error:
        return bool(_JAVA_ONLY_RE.search(v))


def check_schema_document(schema: Any, path: str = "") -> list[SchemaViolation]:
    """All metaschema violations in ``schema`` (empty list = valid)."""
    out: list[SchemaViolation] = []
    _walk(schema, path, out)
    return out


def _err(out: list[SchemaViolation], path: str, kw: str, msg: str) -> None:
    out.append(SchemaViolation(path, kw, msg))


def _walk(schema: Any, path: str, out: list[SchemaViolation]) -> None:
    if isinstance(schema, bool):
        return
    if not isinstance(schema, dict):
        _err(out, path, "", f"a schema must be a boolean or an object, got {type(schema).__name__}")
        return

    for kw, v in schema.items():
        kp = f"{path}/{escape_pointer(kw)}"
        if kw == "type":
            vals = [v] if isinstance(v, str) else v
            if not isinstance(vals, list) or not vals or not all(
                isinstance(t, str) and t in _JSON_TYPES for t in vals
            ) or len(set(vals)) != len(vals):
                _err(out, kp, kw, f"'type' must be one of {sorted(_JSON_TYPES)} or a unique array thereof")
        elif kw == "enum":
            if not isinstance(v, list):
                _err(out, kp, kw, "'enum' must be an array")
        elif kw == "multipleOf":
            if not _is_number(v) or v <= 0:
                _err(out, kp, kw, "'multipleOf' must be a number > 0")
        elif kw in ("maximum", "minimum", "exclusiveMaximum", "exclusiveMinimum"):
            if not _is_number(v):
                _err(out, kp, kw, f"{kw!r} must be a number, got {v!r}")
        elif kw in (
            "maxLength",
            "minLength",
            "maxItems",
            "minItems",
            "maxProperties",
            "minProperties",
            "maxContains",
            "minContains",
        ):
            if not _is_nonneg_int(v):
                _err(out, kp, kw, f"{kw!r} must be a non-negative integer, got {v!r}")
        elif kw == "pattern":
            if not _valid_regex(v):
                _err(out, kp, kw, f"'pattern' must be a valid regular expression string, got {v!r}")
        elif kw == "required":
            if not isinstance(v, list) or not all(isinstance(s, str) for s in v) or len(set(v)) != len(v):
                _err(out, kp, kw, "'required' must be an array of unique strings")
        elif kw == "dependentRequired":
            ok = isinstance(v, dict) and all(
                isinstance(deps, list)
                and all(isinstance(d, str) for d in deps)
                and len(set(deps)) == len(deps)
                for deps in v.values()
            )
            if not ok:
                _err(out, kp, kw, "'dependentRequired' must map property names to arrays of unique strings")
        elif kw == "uniqueItems":
            if not isinstance(v, bool):
                _err(out, kp, kw, "'uniqueItems' must be a boolean")
        elif kw in _SUBSCHEMA_KWS:
            if not _is_schema(v):
                _err(out, kp, kw, f"{kw!r} must be a schema (boolean or object)")
            else:
                _walk(v, kp, out)
        elif kw in _SUBSCHEMA_ARRAY_KWS:
            if not isinstance(v, list) or not v:
                _err(out, kp, kw, f"{kw!r} must be a non-empty array of schemas")
            else:
                for i, sub in enumerate(v):
                    if not _is_schema(sub):
                        _err(out, f"{kp}/{i}", kw, f"{kw!r}[{i}] must be a schema")
                    else:
                        _walk(sub, f"{kp}/{i}", out)
        elif kw in _SUBSCHEMA_OBJECT_KWS:
            if not isinstance(v, dict):
                _err(out, kp, kw, f"{kw!r} must be an object of schemas")
            else:
                for name, sub in v.items():
                    np_ = f"{kp}/{escape_pointer(name)}"
                    if kw == "patternProperties" and not _valid_regex(name):
                        _err(out, np_, kw, f"patternProperties key {name!r} must be a valid regex")
                    if not _is_schema(sub):
                        _err(out, np_, kw, f"{kw}[{name!r}] must be a schema")
                    else:
                        _walk(sub, np_, out)
        elif kw == "$id":
            # 2020-12 disallows non-empty fragments in $id (reference
            # tests/test_vocabulary.py::test_nonempty_fragment_id_disallowed)
            if not isinstance(v, str):
                _err(out, kp, kw, "'$id' must be a string")
            elif "#" in v and v.split("#", 1)[1] != "":
                _err(out, kp, kw, f"'$id' must not contain a non-empty fragment: {v!r}")
        elif kw in ("$ref", "$dynamicRef", "$schema", "$comment", "format", "title", "description"):
            if not isinstance(v, str):
                _err(out, kp, kw, f"{kw!r} must be a string")
        elif kw in ("$anchor", "$dynamicAnchor"):
            if not isinstance(v, str) or not _ANCHOR_RE.match(v):
                _err(out, kp, kw, f"{kw!r} must be a string matching {_ANCHOR_RE.pattern}")
        elif kw == "$vocabulary":
            if not isinstance(v, dict) or not all(isinstance(b, bool) for b in v.values()):
                _err(out, kp, kw, "'$vocabulary' must map URIs to booleans")
        elif kw in ("deprecated", "readOnly", "writeOnly"):
            if not isinstance(v, bool):
                _err(out, kp, kw, f"{kw!r} must be a boolean")
        elif kw == "examples":
            if not isinstance(v, list):
                _err(out, kp, kw, "'examples' must be an array")
        # unknown keywords: annotations, accepted (2020-12 core behavior)
