"""Python-callable format validators (Arrow-batched fallback registry).

The reference registers format validators as plain Python callables
(jschon/vocabulary/format.py:47-66, decorator at formats.py/format
registry). Most 2020-12 formats compile to pure Column regexes in
``core._BUILTIN_FORMATS``; the ones that genuinely need Python
(compiling a regex to see if it IS one, IDNA encoding) run as
Arrow-batched ``pandas_udf`` checks over the string node column.

Limitation: pandas_udfs cannot be referenced inside higher-order
function lambdas, so Python-backed formats apply at row/struct-field
positions only — a ``format: regex`` inside an array ``items`` subschema
fails analysis. Regex-expressible formats have no such restriction.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def python_format(fn: Callable[[str], bool]):
    """Lift a ``str -> bool`` validator into a Ctx->Column format check
    (nulls pass vacuously; the keyword's ``applies`` gate handles them)."""

    def col_fn(ctx) -> Column:
        @F.pandas_udf(T.BooleanType())
        def check(s: pd.Series) -> pd.Series:
            return s.map(lambda v: bool(fn(v)) if v is not None else True)

        return check(ctx.col)

    return col_fn


def is_regex(v: str) -> bool:
    """Is the value itself a valid regular expression?
    ≙ jschon's 'regex' format (ECMA-262 in spec; Python's dialect here,
    same pragmatic substitution the pattern keyword makes, SURVEY §2.9)."""
    try:
        re.compile(v)
        return True
    except re.error:
        return False


_LDH_LABEL = re.compile(r"^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?$")


def is_idn_hostname(v: str) -> bool:
    """IDN hostname via the stdlib IDNA codec (RFC 3490 ToASCII), then
    LDH-label checks on the encoded form (the codec itself does not
    reject hyphen-edged labels)."""
    if not v or len(v) > 253:
        return False
    try:
        encoded = v.encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return False
    return all(_LDH_LABEL.match(label) for label in encoded.split("."))
