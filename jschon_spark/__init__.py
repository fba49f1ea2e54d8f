"""jschon_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the JSON Schema keyword semantics of the reference
(handrews/jschon, see SURVEY.md) as compiled Catalyst ``Column``
predicates and Arrow-batched pandas UDF checks over typed DataFrames,
plus the table-level operators (column stats, HLL sketches, skew-aware
uniqueness, referential joins, distribution drift) the single-document
reference cannot express.

Not a port: runtime is DataFrame plans, the only recursive structure is
the driver-side compiler (≙ jschon's schema compilation,
reference jschon/jsonschema.py:110-119, re-imagined as Column builders).
"""

from jschon_spark.compiler import (
    CompileError,
    CustomKeyword,
    SchemaCatalog,
    compile_schema,
    validate_json_column,
)
from jschon_spark.session import get_session

__version__ = "0.1.0"

# dialect URIs accepted by create_catalog's version shorthands — every
# one is built into the compiler (core.py _KNOWN_DIALECTS), so
# "initialization" here is validation only
_VERSIONS = {
    "2019-09", "2020-12", "next",
    # pre-vocabulary drafts the compiler also supports natively
    "draft-07", "draft-06", "draft-04",
}


def create_catalog(*versions: str, name: str = "catalog") -> SchemaCatalog:
    """≙ the reference's ``jschon.create_catalog(*versions)``
    (jschon/__init__.py:28-54). This engine builds every supported
    dialect's keyword registry into the compiler, so no per-version
    metaschema loading happens — the version arguments are validated
    for compatibility and an unrecognized one raises ``ValueError``
    exactly like the reference."""
    for version in versions:
        if version not in _VERSIONS:
            raise ValueError(f"Unrecognized version {version!r}")
    return SchemaCatalog()


__all__ = [
    "compile_schema",
    "create_catalog",
    "CompileError",
    "CustomKeyword",
    "SchemaCatalog",
    "validate_json_column",
    "get_session",
    "__version__",
]
