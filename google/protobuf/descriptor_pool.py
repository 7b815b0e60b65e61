"""Descriptor pool (mini-runtime): parses serialized
FileDescriptorProto blobs handed over by generated modules."""

from google.protobuf._runtime import FileDescriptor, parse_file_descriptor


class DescriptorPool:
    def __init__(self) -> None:
        self._files: dict[str, FileDescriptor] = {}

    def AddSerializedFile(self, serialized: bytes) -> FileDescriptor:
        fd = parse_file_descriptor(serialized)
        return self._files.setdefault(fd.name, fd)


_default = DescriptorPool()


def Default() -> DescriptorPool:
    return _default
