"""URI-keyed multi-document schema catalog.

≙ the reference's ``Catalog`` (jschon/catalog/__init__.py:70-391): a
registry of schema documents keyed by canonical URI plus URI-prefix
sources that lazily load documents from local directories
(``LocalSource``, catalog/__init__.py:26-46) or fetch them over
HTTP(S) (``add_remote_source`` ≙ RemoteSource,
catalog/__init__.py:57-67 — stdlib urllib, fetch-once-per-catalog at
compile time, precise errors when the deploy has no egress). Compiled
schemas are cached per URI, mirroring ``Catalog.get_schema``'s cache
(catalog/__init__.py:313-368): compile once, validate many.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional
from urllib.parse import urldefrag, urljoin


class SchemaCatalog:
    def __init__(self) -> None:
        self._docs: dict[str, Any] = {}
        self._sources: list[tuple[str, str, str]] = []  # (uri_prefix, dir, suffix)
        self._compiled: dict[str, Any] = {}
        self._nested: dict[str, str] = {}  # nested-resource uri -> containing doc uri
        # vocabulary URI -> {keyword name: CustomKeyword} (create_vocabulary)
        self.vocabularies: dict[str, dict[str, Any]] = {}

    def create_vocabulary(self, uri: str, *keywords: Any) -> str:
        """Register user-defined keywords under a vocabulary URI.

        ≙ the reference's ``Catalog.create_vocabulary(URI, *KwClasses)``
        (jschon/catalog/__init__.py:149-160, examples/custom_keyword.py:
        60-64): a metaschema that lists ``uri`` in its ``$vocabulary``
        activates these keywords for the resources it governs. Takes
        :class:`~jschon_spark.compiler.vocabulary.CustomKeyword` specs;
        registering the same URI again replaces the set."""
        from jschon_spark.compiler.vocabulary import CustomKeyword

        kws: dict[str, Any] = {}
        for kw in keywords:
            if not isinstance(kw, CustomKeyword):
                raise TypeError(f"create_vocabulary takes CustomKeyword specs, got {kw!r}")
            kws[kw.key] = kw
        key = uri.rstrip("#")
        self.vocabularies[key] = kws
        self._compiled.clear()  # keyword sets changed; cached plans are stale
        return key

    def add_schema(self, doc: Any, uri: Optional[str] = None) -> str:
        """Register a schema document under ``uri`` (default: its $id).

        Embedded resources (subschemas carrying their own ``$id``) are
        indexed too, so a $ref that targets a NESTED resource's URI
        directly resolves without the referrer naming the containing
        document — the reference registers every schema resource in the
        catalog as it is constructed (jschon/jsonschema.py $id keyword →
        catalog.add_schema), and round-3 differential fuzzing caught
        this exact asymmetry."""
        uri = uri or (doc.get("$id") if isinstance(doc, dict) else None)
        if not uri:
            raise ValueError("schema document needs a $id or an explicit uri")
        key = urldefrag(uri).url
        self._docs[key] = doc
        self._index_nested(doc, key, key, top=True)
        return key

    def _index_nested(self, node: Any, base: str, root_key: str, top: bool = False) -> None:
        if isinstance(node, dict):
            if isinstance(node.get("$id"), str):
                base = urljoin(base, node["$id"])
                if not top:
                    self._nested.setdefault(urldefrag(base).url, root_key)
            for k, v in node.items():
                # same non-schema value positions the compiler's _index skips
                if k in ("enum", "const", "default", "examples"):
                    continue
                self._index_nested(v, base, root_key)
        elif isinstance(node, list):
            for v in node:
                self._index_nested(v, base, root_key)

    def containing_document_uri(self, uri: str) -> Optional[str]:
        """URI of the registered document that EMBEDS ``uri`` as a
        nested $id resource (None if ``uri`` is unknown or top-level)."""
        return self._nested.get(urldefrag(uri).url)

    def add_directory_source(self, uri_prefix: str, directory: str, suffix: str = ".json") -> None:
        """Map a URI prefix to a local directory: ``{prefix}foo`` loads
        ``{directory}/foo{suffix}`` on first reference (longest-prefix
        match order, ≙ add_uri_source/LocalSource)."""
        self._sources.append((uri_prefix, directory, suffix))
        self._sources.sort(key=lambda s: -len(s[0]))

    def add_remote_source(
        self,
        uri_prefix: str,
        base_url: Optional[str] = None,
        suffix: str = "",
        timeout: float = 10.0,
    ) -> None:
        """≙ the reference's RemoteSource (jschon/catalog/__init__.py:
        57-67): a lookup of ``{uri_prefix}foo`` fetches
        ``{base_url or uri_prefix}foo{suffix}`` over HTTP(S) with the
        stdlib urllib, parses it as JSON, and caches the document like
        any locally registered schema (fetched once per catalog, at
        compile time — never per row). ``base_url`` lets canonical
        ``$id`` URIs map to a different serving host (e.g. a test
        server or an internal mirror). A failed fetch raises a precise
        error naming the URI and source — including the
        likely-no-network-access cause, since sandboxed deploys often
        lack egress."""
        self._remote_prefixes = getattr(self, "_remote_prefixes", [])
        self._remote_prefixes.append(
            (uri_prefix, base_url if base_url is not None else uri_prefix, suffix, timeout)
        )
        self._remote_prefixes.sort(key=lambda s: -len(s[0]))

    def lookup(self, uri: str) -> Optional[Any]:
        """Resolve a canonical (fragmentless) URI to a document, loading
        from a directory source on miss."""
        key = urldefrag(uri).url
        if key in self._docs:
            return self._docs[key]
        for prefix, directory, suffix in self._sources:
            if key.startswith(prefix):
                rel = key[len(prefix):]
                path = os.path.realpath(os.path.join(directory, rel + suffix))
                # containment check: a URI remainder with '..' segments
                # must not escape the mapped directory
                root = os.path.realpath(directory)
                if os.path.commonpath([root, path]) != root:
                    continue
                if os.path.exists(path):
                    with open(path) as f:
                        doc = json.load(f)
                    self._docs[key] = doc
                    return doc
        for prefix, base, suffix, timeout in getattr(self, "_remote_prefixes", []):
            if key.startswith(prefix):
                import urllib.request

                url = base + key[len(prefix):] + suffix
                try:
                    with urllib.request.urlopen(url, timeout=timeout) as resp:
                        doc = json.loads(resp.read().decode("utf-8"))
                except Exception as e:
                    raise RuntimeError(
                        f"schema {key!r} could not be fetched from remote "
                        f"source {prefix!r} (GET {url}): {e!r} — if this "
                        "environment has no network access, register the "
                        "document locally with add_schema/add_directory_source"
                    ) from e
                self._docs[key] = doc
                return doc
        return None

    def del_schema(self, uri: str) -> None:
        """Drop a registered document and every compiled plan derived
        from it (≙ the reference's Catalog.del_schema,
        jschon/catalog/__init__.py:305-311 — deleting a nonexistent
        entry is a no-op there too)."""
        key = urldefrag(uri).url
        self._docs.pop(key, None)
        self._nested = {n: r for n, r in self._nested.items() if r != key and n != key}
        # compiled plans may have inlined the document through $refs —
        # conservatively drop the whole cache
        self._compiled.clear()

    def compile(self, uri_or_doc: Any, **kw):
        """Compile a registered URI (cached) or an ad-hoc document with
        this catalog resolving its external $refs.

        A URI with a fragment — a JSON pointer (``doc#/$defs/x``) or a
        plain-name anchor (``doc#items``) — compiles THAT subschema,
        like the reference's ``catalog.get_schema`` pointer/anchor
        resolution (jschon/catalog/__init__.py:313-368,
        tests/test_catalog.py:213-228): the plan is a ``$ref`` wrapper
        into the containing document, so the target's own ``$refs`` and
        dynamic scope resolve within its resource. Violation
        keyword_paths therefore carry the wrapper's ``/$ref`` prefix —
        a documented location delta vs the reference's target-relative
        paths."""
        from jschon_spark.compiler.core import CompileError, CompiledSchema

        if isinstance(uri_or_doc, str):
            key, frag = urldefrag(uri_or_doc)
            cache_key = ((key, frag), tuple(sorted(kw.items())))
            try:
                hash(cache_key)
            except TypeError:
                cache_key = None  # unhashable kwargs (e.g. dicts) → no cache
            if cache_key is not None and cache_key in self._compiled:
                return self._compiled[cache_key]
            doc = self.lookup(key)
            if doc is None:
                raise CompileError(f"unknown schema uri {uri_or_doc!r}")
            if frag:
                # match the ad-hoc wrapper's dialect to the target
                # document's, so keyword gating follows its metaschema
                wrapper: dict = {"$ref": f"{key}#{frag}"}
                if isinstance(doc, dict) and isinstance(doc.get("$schema"), str):
                    wrapper["$schema"] = doc["$schema"]
                compiled = CompiledSchema(wrapper, catalog=self, **kw)
            else:
                compiled = CompiledSchema(doc, catalog=self, **kw)
            if cache_key is not None:
                self._compiled[cache_key] = compiled
            return compiled
        return CompiledSchema(uri_or_doc, catalog=self, **kw)
