"""Runtime-version gate (mini-runtime): generated modules call this to
refuse gencode/runtime skew. The mini-runtime implements the stable
wire format, which is version-independent — validation is a no-op."""

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix, location) -> None:
    return None
