"""RUN THE REFERENCE IMPLEMENTATION as a parity oracle.

The reference at /root/reference is not normally runnable in this
sandbox: its one external dependency (rfc3986) is absent and its
metaschema catalog submodule is empty. ``tests/ref_oracle/`` supplies a
minimal stdlib rfc3986 shim (API surface of jschon/uri.py only) and a
faithful reconstruction of the public 2020-12 metaschema documents, so
jschon itself compiles, self-validates its metaschema, and evaluates.

Every ported 2020-12 suite case (tests/test_suite_port.py) is then run
through BOTH engines: this file asserts the reference agrees with the
ported ``valid`` expectation — machine-checking the hand-ported
expectations against the actual reference — while test_suite_port.py
asserts the Spark engine against the same expectations. Together they
close the loop: Spark engine ≡ ported expectation ≡ reference.

The oracle evaluates JSON Python values directly (no Spark), so even
the heterogeneous-array cases that Untypeable-skip on the Spark side
are verified against the reference here.
"""

from __future__ import annotations

import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def ref():
    """(catalog, jschon modules) with the shimmed reference imported."""
    sys.path.insert(0, os.path.join(_HERE, "ref_oracle"))
    sys.path.insert(0, "/root/reference")
    try:
        from jschon import JSON, JSONSchema, URI
        from jschon.catalog import Catalog, LocalSource, _2020_12
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    meta_dir = os.path.join(_HERE, "ref_oracle", "json-schema-2020-12")
    orig_source = _2020_12.LocalSource
    _2020_12.LocalSource = lambda base_dir, **kw: LocalSource(meta_dir, **kw)
    try:
        try:
            catalog = Catalog.get_catalog("parity")
        except Exception:
            catalog = Catalog(name="parity")
            _2020_12.initialize(catalog)
    finally:
        _2020_12.LocalSource = orig_source
    return {"catalog": catalog, "JSON": JSON, "JSONSchema": JSONSchema, "URI": URI}


def _suite_cases():
    from tests.test_suite_port import SUITE

    out = []
    for i, (fname, gdesc, schema, tests) in enumerate(SUITE):
        for tdesc, data, valid in tests:
            out.append(
                pytest.param(i, schema, data, valid, id=f"{fname}|{gdesc}|{tdesc}")
            )
    return out


try:
    sys.path.insert(0, os.path.dirname(_HERE))
    CASES = _suite_cases()
except Exception:  # pragma: no cover - collection fallback
    CASES = []

_SCHEMA_CACHE: dict = {}
_META = "https://json-schema.org/draft/2020-12/schema"


@pytest.mark.parametrize("idx,schema,data,valid", CASES)
def test_reference_agrees_with_ported_expectation(ref, idx, schema, data, valid):
    JSON, JSONSchema, URI = ref["JSON"], ref["JSONSchema"], ref["URI"]
    key = idx
    if key not in _SCHEMA_CACHE:
        try:
            _SCHEMA_CACHE[key] = JSONSchema(
                schema,
                catalog=ref["catalog"],
                cacheid=f"case-{idx}",
                metaschema_uri=URI(_META),
            )
        except Exception as e:
            _SCHEMA_CACHE[key] = e
    compiled = _SCHEMA_CACHE[key]
    if isinstance(compiled, Exception):
        pytest.skip(f"reference could not compile this schema here: {compiled}")
    got = compiled.evaluate(JSON(data)).valid
    assert got == valid, (
        f"REFERENCE disagrees with ported expectation: schema={schema!r} "
        f"data={data!r}: reference says {got}, port says {valid}"
    )


@pytest.fixture(scope="module")
def ref19(ref):
    """Catalog with the 2019-09 dialect added (legacy parity)."""
    from jschon.catalog import Catalog, LocalSource, _2019_09

    meta_dir = os.path.join(_HERE, "ref_oracle", "json-schema-2019-09")
    orig = _2019_09.LocalSource
    _2019_09.LocalSource = lambda base_dir, **kw: LocalSource(meta_dir, **kw)
    try:
        _2019_09.initialize(ref["catalog"])
    except Exception:
        pass  # already initialized on a rerun
    finally:
        _2019_09.LocalSource = orig
    return ref


def _legacy_1909_cases():
    from tests.test_suite_port_legacy import LEGACY

    out = []
    for i, (gdesc, schema, tests) in enumerate(LEGACY):
        if not (isinstance(schema, dict) and schema.get("$schema", "").startswith(
            "https://json-schema.org/draft/2019-09"
        )):
            continue
        for tdesc, data, valid in tests:
            out.append(pytest.param(1000 + i, schema, data, valid, id=f"{gdesc}|{tdesc}"))
    return out


try:
    CASES_1909 = _legacy_1909_cases()
except Exception:  # pragma: no cover
    CASES_1909 = []


@pytest.mark.parametrize("idx,schema,data,valid", CASES_1909)
def test_reference_agrees_2019_09(ref19, idx, schema, data, valid):
    JSON, JSONSchema, URI = ref19["JSON"], ref19["JSONSchema"], ref19["URI"]
    if idx not in _SCHEMA_CACHE:
        try:
            _SCHEMA_CACHE[idx] = JSONSchema(
                schema, catalog=ref19["catalog"], cacheid=f"case19-{idx}"
            )
        except Exception as e:
            _SCHEMA_CACHE[idx] = e
    compiled = _SCHEMA_CACHE[idx]
    if isinstance(compiled, Exception):
        pytest.skip(f"reference could not compile this schema here: {compiled}")
    got = compiled.evaluate(JSON(data)).valid
    assert got == valid, (
        f"REFERENCE (2019-09) disagrees with ported expectation: "
        f"schema={schema!r} data={data!r}: reference says {got}, port says {valid}"
    )
