"""Message base class (mini-runtime façade)."""

from google.protobuf._runtime import Message  # noqa: F401


class Error(Exception):
    pass


class DecodeError(Error):
    pass
