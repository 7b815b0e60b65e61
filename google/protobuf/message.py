"""Message base class (mini-runtime façade).

Error/DecodeError are the SAME classes the wire parser raises
(r7 ADVICE item 2): callers that ``except message.DecodeError`` catch
malformed-wire failures exactly as with the real runtime.
"""

from google.protobuf._runtime import DecodeError, Error, Message  # noqa: F401
