"""User-defined keyword vocabularies.

The reference lets users extend the dialect with new keywords by
subclassing ``Keyword`` and registering the class against a vocabulary
URI (``Catalog.create_vocabulary``, jschon/catalog/__init__.py:149-160;
``Keyword`` contract in jschon/vocabulary/__init__.py:104-200; worked
example examples/custom_keyword.py). A keyword class supplies:

* ``key`` — the keyword name;
* ``instance_types`` — JSON types the keyword applies to (evaluation is
  skipped, i.e. vacuously passes, for other types);
* ``__init__`` — compile-time validation of the keyword VALUE (raising
  ``JSONSchemaError`` aborts schema construction);
* ``evaluate(instance, result)`` — per-instance logic calling
  ``result.fail(msg)`` / ``result.annotate(value)``.

The Spark-first equivalent is declarative: a :class:`CustomKeyword`
carries a *predicate builder* that maps (keyword value, evaluation
context) to a boolean Column, compiled once into the schema's single
expression tree — per-row Python never runs. Activation follows the
reference's vocabulary model exactly: the keyword participates only in
schema resources whose metaschema lists the vocabulary URI in
``$vocabulary`` (under the standard dialects it stays inert, matching
jschon where only the metaschema's kwclasses evaluate).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Union

from pyspark.sql import Column

from jschon_spark.compiler.context import Ctx

__all__ = ["CustomKeyword"]


@dataclass(frozen=True)
class CustomKeyword:
    """One user-defined keyword (≙ a reference ``Keyword`` subclass).

    key
        Keyword name as it appears in schemas. Must not shadow a
        built-in keyword.
    predicate
        ``(value, ctx) -> Column<boolean>`` — builds the per-row
        validity predicate from the keyword's value in the schema and
        the typed evaluation context (``ctx.col`` is the instance node's
        Column, ``ctx.dtype`` its static Spark type). Evaluated over
        non-null, type-matching nodes only; nulls inside the predicate
        resolve to *invalid* (mirroring ``leaf``'s coalesce). ≙
        ``Keyword.evaluate`` (jschon/vocabulary/__init__.py:188-200),
        compiled instead of interpreted.
    instance_types
        JSON type names (``"string"``, ``"number"``, ``"integer"``,
        ``"boolean"``, ``"array"``, ``"object"``, ``"null"``) the
        keyword applies to; empty = all types. A node whose static type
        is outside the set constant-folds away, and a runtime null
        passes vacuously — the reference's ``instance_types`` gate
        (jschon/vocabulary/__init__.py:131, jsonschema.py:208-209).
    check
        Optional compile-time validation of the keyword VALUE:
        ``check(value)`` raising any exception aborts compilation with a
        ``CompileError`` naming the schema location — ≙ raising
        ``JSONSchemaError`` from ``Keyword.__init__``
        (examples/custom_keyword.py:32-36).
    message
        Violation message on failure: a string, or ``(value) -> str``.
    annotate
        Optional ``(value) -> Any`` producing a JSON-serializable
        annotation emitted when the node (hence this keyword) is valid —
        ≙ ``result.annotate(...)`` on success. The value is computed at
        compile time from the keyword's schema value; per-row dynamic
        annotations are not expressible (they would force row-at-a-time
        Python into the hot path).
    assertion
        ``False`` makes the keyword annotation-only (it never fails),
        like the meta-data vocabulary keywords.
    """

    key: str
    predicate: Optional[Callable[[Any, Ctx], Column]] = None
    instance_types: tuple = ()
    check: Optional[Callable[[Any], None]] = None
    message: Union[str, Callable[[Any], str]] = ""
    annotate: Optional[Callable[[Any], Any]] = None
    assertion: bool = True

    def __post_init__(self):
        if self.assertion and self.predicate is None:
            raise ValueError(
                f"custom keyword {self.key!r}: an asserting keyword needs a predicate"
            )

    def error_message(self, value: Any) -> str:
        if callable(self.message):
            return self.message(value)
        return self.message or f"the instance failed the {self.key!r} check"
