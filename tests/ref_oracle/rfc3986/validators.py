"""Validator mirrored from rfc3986.validators (subset used by jschon)."""

from .exceptions import ValidationError


class Validator:
    def __init__(self):
        self._required = set()

    def require_presence_of(self, *components):
        v = Validator()
        v._required = self._required | set(components)
        return v

    def validate(self, uriref):
        for c in self._required:
            if getattr(uriref, c, None) is None:
                raise ValidationError(f"missing required component {c!r}")
