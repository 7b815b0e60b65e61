"""Descriptor classes (mini-runtime façade). ``_USE_C_DESCRIPTORS``
is checked by generated modules before assigning serialized offsets —
always False here (pure Python)."""

from google.protobuf._runtime import (  # noqa: F401
    Descriptor,
    EnumDescriptor,
    FieldDescriptor,
    FileDescriptor,
)

_USE_C_DESCRIPTORS = False
