"""Legacy-dialect (2019-09 / draft-07) schema rewriting.

The reference supports older dialects via separate keyword classes
(jschon/vocabulary/legacy.py:15-151: tuple-form ``items``,
``additionalItems``, ``$recursiveRef``/``$recursiveAnchor``). Real-world
schema corpora are full of these, so instead of a parallel keyword
registry we normalize them into their exact 2020-12 equivalents at
compile time (the mapping is the one the 2020-12 changelog defines):

- ``items: [s1, s2]``            → ``prefixItems: [s1, s2]``
- ``additionalItems: s`` (with tuple items) → ``items: s``
- ``dependencies``               → split into ``dependentRequired`` /
                                   ``dependentSchemas`` (draft-07)
- ``$recursiveAnchor: true``     → ``$dynamicAnchor: "__recursive__"``
- ``$recursiveRef: "#"``         → ``$dynamicRef: "#__recursive__"``

The rewrite is semantics-preserving for 2020-12 documents (which cannot
legally contain any of these forms), so by default it is shape-driven.
EXCEPT: when the governing ``$schema`` explicitly declares a dialect
that REMOVED a form, the form stays unrewritten — the reference treats
it there as an unknown keyword (annotation, no assertion; probe-verified
round 4: ``dependencies`` under an explicit 2020-12 ``$schema`` does not
assert in jschon), and shapes the modern metaschema rejects outright
(tuple ``items``, boolean exclusive bounds) then fail our metaschema
check loudly instead of being silently modernized. Schemas WITHOUT an
explicit ``$schema`` keep the permissive shape-driven rewrite — that
leniency is an advertised input-compatibility feature.
Recursion is SHAPE-AWARE — it descends only into known subschema
positions, so a property literally named "items" or "dependencies" is
never rewritten.
"""

from __future__ import annotations

from typing import Any

_RECURSIVE_NAME = "__recursive__"

# marker the compiler uses to apply 2019-09 additionalItems discard
# semantics to a rewritten `items` keyword (unknown keyword → plain
# annotation everywhere else, so it is inert in the 2020-12 pipeline)
_ADDITIONAL_ITEMS_MARKER = "x-legacy-additionalItems"

_SUB = {
    "additionalProperties",
    "contains",
    "not",
    "if",
    "then",
    "else",
    "propertyNames",
    "unevaluatedItems",
    "unevaluatedProperties",
    "contentSchema",
}
_SUB_ARRAY = {"prefixItems", "allOf", "anyOf", "oneOf"}
_SUB_OBJECT = {"properties", "patternProperties", "dependentSchemas", "$defs", "definitions"}


# marker for 2019-09 unevaluatedItems: that dialect's keyword collects
# only items/additionalItems/unevaluatedItems annotations — NOT
# contains (reference legacy.py:114-137 vs applicator.py:235-265), so
# contains-matched elements stay unevaluated. Inert unknown keyword in
# the 2020-12 pipeline.
_UNEV_ITEMS_NO_CONTAINS_MARKER = "x-legacy-unevaluatedItemsNoContains"

# marker for a BOOLEAN-form 2019-09 `items`: that dialect's keyword
# evaluates the whole array against the boolean schema but NEVER
# annotates (reference legacy.py:63-64 — no result.annotate call,
# unlike the schema form at legacy.py:66-71), so it contributes no
# unevaluatedItems coverage. The 2020-12 `items` it rewrites to DOES
# annotate; the compiler's coverage model skips marked sources.
_BOOL_ITEMS_NO_ANNOT_MARKER = "x-legacy-boolItemsNoAnnotation"

# marker for draft-04/-06/-07 $ref: in those dialects a schema object
# containing $ref behaves as a pure reference — every sibling keyword
# is IGNORED (draft-07 core §8.3; official suite draft7/ref.json
# "ref overrides any sibling keywords"). 2019-09 made $ref a regular
# keyword evaluated alongside siblings. Siblings stay in the document
# (JSON-pointer refs may address into them) but do not assert.
_REF_ONLY_MARKER = "x-legacy-refOnly"

_1909_URI = "https://json-schema.org/draft/2019-09/schema"
_PRE_1909_URIS = frozenset(
    f"http://json-schema.org/draft-0{n}/schema" for n in (4, 6, 7)
)
_MODERN_URIS = frozenset(
    {
        "https://json-schema.org/draft/2020-12/schema",
        "https://json-schema.org/draft/next/schema",
    }
)
_DRAFT04_URI = "http://json-schema.org/draft-04/schema"


def _declares(dialect_uri: Any, uris) -> bool:
    return isinstance(dialect_uri, str) and dialect_uri.rstrip("#") in uris


def rewrite_legacy(schema: Any, dialect_uri: Any = None) -> Any:
    """Recursively normalized copy of ``schema`` (input not mutated).
    ``dialect_uri`` is the governing $schema of the enclosing resource
    (updated wherever a node declares its own $schema) — it drives the
    dialect-SEMANTIC markers, while the shape rewrites stay
    shape-driven."""
    if not isinstance(schema, dict):
        return schema
    if isinstance(schema.get("$schema"), str):
        dialect_uri = schema["$schema"]

    # which forms the DECLARED dialect still defines (see module note:
    # explicit modern $schema → removed forms stay unrewritten)
    modern = _declares(dialect_uri, _MODERN_URIS)  # 2020-12 / next
    post_1909 = modern or _declares(dialect_uri, {_1909_URI})
    post_draft04 = post_1909 or (
        _declares(dialect_uri, _PRE_1909_URIS)
        and not _declares(dialect_uri, {_DRAFT04_URI})
    )

    # draft-04 boolean exclusive bounds: {"maximum": M,
    # "exclusiveMaximum": true} means value < M — rewrite to the
    # numeric 2020-12 form before the keyword loop (draft-06+ made the
    # keyword numeric, so an explicit later dialect passes the boolean
    # through to fail the metaschema check)
    schema = dict(schema)
    if not post_draft04:
        for bound, excl in (("maximum", "exclusiveMaximum"), ("minimum", "exclusiveMinimum")):
            if isinstance(schema.get(excl), bool):
                if schema.pop(excl) and bound in schema:
                    schema[excl] = schema.pop(bound)

    out: dict[str, Any] = {}
    for k, v in schema.items():
        if k == "items" and not (modern and isinstance(v, list)):
            if isinstance(v, list):
                out["prefixItems"] = [rewrite_legacy(s, dialect_uri) for s in v]
            else:
                out["items"] = rewrite_legacy(v, dialect_uri)
                if isinstance(v, bool) and isinstance(dialect_uri, str) and (
                    dialect_uri.rstrip("#") == _1909_URI
                    or dialect_uri.rstrip("#") in _PRE_1909_URIS
                ):
                    out[_BOOL_ITEMS_NO_ANNOT_MARKER] = True
        elif k == "additionalItems" and not modern:
            if isinstance(schema.get("items"), list):
                out["items"] = rewrite_legacy(v, dialect_uri)
                # 2019-09 additionalItems is DISCARDED (no assertion, no
                # annotation) when the tuple `items` fails — the items
                # annotation it depends on is only set on success
                # (reference legacy.py:76-85 annotate-on-else,
                # legacy.py:93-94/109-110 `type(items.annotation) is int`
                # else discard). 2020-12 `items` applies unconditionally,
                # so mark the rewritten keyword for the compiler to gate
                # on prefixItems validity (core.py _k_items).
                out[_ADDITIONAL_ITEMS_MARKER] = True
            # else: additionalItems is ignored without tuple items
            # (reference legacy.py:113-121)
        elif k == "dependencies" and isinstance(v, dict) and not post_1909:
            req = {n: d for n, d in v.items() if isinstance(d, list)}
            schemas = {n: rewrite_legacy(d, dialect_uri) for n, d in v.items() if not isinstance(d, list)}
            if req:
                out.setdefault("dependentRequired", {}).update(req)
            if schemas:
                out.setdefault("dependentSchemas", {}).update(schemas)
        elif k == "$recursiveAnchor" and not modern:
            if v is True:
                out["$dynamicAnchor"] = _RECURSIVE_NAME
        elif k == "$recursiveRef" and not modern:
            out["$dynamicRef"] = "#" + _RECURSIVE_NAME if v == "#" else v
        elif k in _SUB:
            out[k] = rewrite_legacy(v, dialect_uri)
        elif k in _SUB_ARRAY and isinstance(v, list):
            out[k] = [rewrite_legacy(s, dialect_uri) for s in v]
        elif k == "dependentSchemas" and isinstance(v, dict):
            # MERGE with any dependencies-derived entries (explicit
            # names win) — plain assignment would drop them when
            # 'dependencies' precedes this key in document order
            out.setdefault("dependentSchemas", {}).update(
                {n: rewrite_legacy(s, dialect_uri) for n, s in v.items()}
            )
        elif k == "dependentRequired" and isinstance(v, dict):
            out.setdefault("dependentRequired", {}).update(v)
        elif k in _SUB_OBJECT and isinstance(v, dict):
            out[k] = {n: rewrite_legacy(s, dialect_uri) for n, s in v.items()}
        else:
            out[k] = v
    if (
        "unevaluatedItems" in out
        and isinstance(dialect_uri, str)
        and dialect_uri.rstrip("#") == _1909_URI
    ):
        # 2019-09 unevaluatedItems never sees contains annotations —
        # the compiler's coverage model must skip contains sources here
        out[_UNEV_ITEMS_NO_CONTAINS_MARKER] = True
    if (
        "$ref" in out
        and isinstance(dialect_uri, str)
        and dialect_uri.rstrip("#") in _PRE_1909_URIS
        and len(out) > 1
    ):
        # pre-2019-09 $ref ignores every sibling keyword
        out[_REF_ONLY_MARKER] = True
    return out
