"""Minimal pure-stdlib stand-in for the ``rfc3986`` package, covering
exactly the API surface the reference's ``jschon/uri.py`` uses
(uri_reference / URIReference.{unsplit, resolve_with, copy_with,
is_absolute, normalize}, misc.UseExisting, validators.Validator,
exceptions.ValidationError).

Exists so the READ-ONLY reference implementation at /root/reference can
be imported and run as a parity oracle in this no-network sandbox (the
real rfc3986 dependency is not installed). Parsing uses the RFC 3986
Appendix B regex; resolution implements §5.2 strictly (including the
None-vs-empty component distinction that urllib.parse collapses).
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

from . import exceptions, misc, validators  # noqa: F401  (submodule API)

_RFC3986_RE = re.compile(
    r"^(?:(?P<scheme>[^:/?#]+):)?"
    r"(?://(?P<authority>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$",
    re.DOTALL,
)


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if out:
                out.pop()
        elif buf == "/..":
            buf = "/"
            if out:
                out.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            m = re.match(r"^/?[^/]*", buf)
            seg = m.group(0)
            out.append(seg)
            buf = buf[len(seg):]
    return "".join(out)


class URIReference(NamedTuple):
    scheme: Optional[str]
    authority: Optional[str]
    path: Optional[str]
    query: Optional[str]
    fragment: Optional[str]

    # -- jschon/uri.py API -------------------------------------------------

    def unsplit(self) -> str:
        s = ""
        if self.scheme is not None:
            s += self.scheme + ":"
        if self.authority is not None:
            s += "//" + self.authority
        s += self.path or ""
        if self.query is not None:
            s += "?" + self.query
        if self.fragment is not None:
            s += "#" + self.fragment
        return s

    def is_absolute(self) -> bool:
        # absolute-URI = scheme ":" hier-part [ "?" query ] — no fragment
        return self.scheme is not None and self.fragment is None

    def normalize(self) -> "URIReference":
        scheme = self.scheme.lower() if self.scheme is not None else None
        authority = self.authority.lower() if self.authority is not None else None
        path = self.path
        if scheme is not None and path:
            path = _remove_dot_segments(path)
        return URIReference(scheme, authority, path, self.query, self.fragment)

    def resolve_with(self, base: "URIReference") -> "URIReference":
        """RFC 3986 §5.2.2 strict transformation."""
        r, b = self, base
        if r.scheme is not None:
            return URIReference(
                r.scheme, r.authority, _remove_dot_segments(r.path or ""), r.query, r.fragment
            )
        if r.authority is not None:
            return URIReference(
                b.scheme, r.authority, _remove_dot_segments(r.path or ""), r.query, r.fragment
            )
        if not r.path:
            path = b.path
            query = r.query if r.query is not None else b.query
        else:
            if r.path.startswith("/"):
                path = _remove_dot_segments(r.path)
            else:
                # §5.2.3 merge
                if b.authority is not None and not b.path:
                    merged = "/" + r.path
                else:
                    merged = (b.path or "").rpartition("/")[0] + "/" + r.path
                path = _remove_dot_segments(merged)
            query = r.query
        return URIReference(b.scheme, b.authority, path, query, r.fragment)

    def copy_with(
        self,
        scheme=misc.UseExisting,
        authority=misc.UseExisting,
        path=misc.UseExisting,
        query=misc.UseExisting,
        fragment=misc.UseExisting,
    ) -> "URIReference":
        def pick(new, old):
            return old if new is misc.UseExisting else new

        return URIReference(
            pick(scheme, self.scheme),
            pick(authority, self.authority),
            pick(path, self.path),
            pick(query, self.query),
            pick(fragment, self.fragment),
        )

    def __eq__(self, other) -> bool:  # type: ignore[override]
        if isinstance(other, str):
            other = uri_reference(other)
        if isinstance(other, URIReference):
            return tuple(self) == tuple(other)
        return NotImplemented

    def __ne__(self, other) -> bool:  # type: ignore[override]
        eq = self.__eq__(other)
        return eq if eq is NotImplemented else not eq

    def __hash__(self) -> int:
        return hash(tuple(self))


def uri_reference(value: str) -> URIReference:
    m = _RFC3986_RE.match(value or "")
    return URIReference(
        m.group("scheme"), m.group("authority"), m.group("path"),
        m.group("query"), m.group("fragment"),
    )
