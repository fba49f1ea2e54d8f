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
    SchemaCatalog,
    compile_schema,
    validate_json_column,
)
from jschon_spark.session import get_session

__version__ = "0.1.0"

__all__ = [
    "compile_schema",
    "CompileError",
    "SchemaCatalog",
    "validate_json_column",
    "get_session",
    "__version__",
]
