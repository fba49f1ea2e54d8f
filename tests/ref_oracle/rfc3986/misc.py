"""Sentinel used by URIReference.copy_with (mirrors rfc3986.misc)."""


class _UseExisting:
    def __repr__(self):
        return "UseExisting"


UseExisting = _UseExisting()
