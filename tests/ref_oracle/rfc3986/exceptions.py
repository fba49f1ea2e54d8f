"""Exception types mirrored from rfc3986.exceptions (subset)."""


class RFC3986Exception(Exception):
    pass


class ValidationError(RFC3986Exception):
    pass
