"""The two build hooks every modern protoc-generated module calls.

``BuildMessageAndEnumDescriptors`` publishes ``_MESSAGENAME``
descriptor keys into the module globals (the generated tail assigns
``_serialized_start``/``_serialized_end`` onto them);
``BuildTopDescriptorsAndMessages`` publishes the concrete message
classes and module-level enum value constants.
"""

from google.protobuf._runtime import (
    Descriptor,
    FileDescriptor,
    build_message_class,
    descriptor_key,
)


def _walk(md: Descriptor):
    yield md
    for nested in md.nested_types:
        yield from _walk(nested)


def BuildMessageAndEnumDescriptors(file_des: FileDescriptor, module_globals: dict) -> None:
    pkg = file_des.package
    for top in file_des.message_types_by_name.values():
        for md in _walk(top):
            module_globals[descriptor_key(md, pkg)] = md
            for ed in md.enum_types:
                local = ed.full_name[len(pkg) + 2 :] if pkg else ed.full_name.lstrip(".")
                module_globals["_" + local.replace(".", "_").upper()] = ed
    for ed in file_des.enum_types_by_name.values():
        module_globals["_" + ed.name.upper()] = ed


def BuildTopDescriptorsAndMessages(
    file_des: FileDescriptor, module_name: str, module_globals: dict
) -> None:
    for top in file_des.message_types_by_name.values():
        cls = build_message_class(top)
        cls.__module__ = module_name
        module_globals[top.name] = cls
    for ed in file_des.enum_types_by_name.values():
        module_globals[ed.name] = ed
        for vname, vnum in ed.values_by_name.items():
            module_globals[vname] = vnum
    # nested enums' values are exposed on their containing class by
    # build_message_class; top-level enum values are module-level.
