"""Minimal pure-Python protobuf runtime — just enough to run
protoc-generated ``*_pb2`` modules and their wire protocol in an
environment with no ``protobuf`` distribution.

Written for PySpark's ``transformWithStateInPandas`` state protocol
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), whose Python
worker side requires the ``google.protobuf`` runtime that this
container does not ship. The implementation is original, from the
public protobuf wire-format and descriptor.proto specifications
(https://protobuf.dev/programming-guides/encoding/); it vendors no
Google code.

Scope (deliberate, fail-loud outside it):
 - proto3 files; scalar types int32/int64/uint32/uint64/bool/enum/
   string/bytes, message fields, repeated fields (packed accepted on
   parse, unpacked emitted), oneofs (incl. proto3 optional's
   synthetic oneofs → explicit presence).
 - messages support kwargs construction, attribute get/set, nested
   sub-message auto-vivification with presence-on-write (the
   ``msg.ttl.durationMs = 5`` idiom), SerializeToString,
   ParseFromString, CopyFrom, HasField.
 - no groups, no maps, no extensions, no fixed32/64 or float/double
   fields (parse skips over unknown field numbers, but a *schema*
   using unsupported types raises at build time), no services, no
   JSON mapping, no text format.

The descriptor set reaches us exactly as real protobuf gets it: as a
serialized FileDescriptorProto blob passed to
``descriptor_pool.Default().AddSerializedFile``. We parse that blob
with a hand-written reader for the (public, stable) descriptor.proto
subset we need — the same bootstrap every protobuf runtime does.
"""

from __future__ import annotations

from typing import Any, Iterator


class Error(Exception):
    """Top-level runtime error (mirrors google.protobuf.message.Error)."""


class DecodeError(Error, ValueError):
    """Malformed wire data (mirrors google.protobuf.message.DecodeError).

    Subclasses ValueError so pre-existing callers that caught the old
    bare ValueError keep working (r7 ADVICE item 2)."""

# --- FieldDescriptorProto.Type values (descriptor.proto, public) ----------
TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14
_VARINT_TYPES = {TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_BOOL, TYPE_UINT32, TYPE_ENUM}
_LEN_TYPES = {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}
_SUPPORTED = _VARINT_TYPES | _LEN_TYPES

LABEL_REPEATED = 3

# --- wire-level codec ------------------------------------------------------


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value += 1 << 64  # two's-complement 64-bit, per the encoding spec
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise DecodeError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            # truncate to 64 bits: a non-canonical 10-byte varint whose
            # final byte carries extra high bits must decode exactly as
            # the real runtime does (r7 ADVICE item 1)
            return result & ((1 << 64) - 1), pos
        shift += 7
        # 10 bytes carry 70 payload bits — a continuation byte past
        # that is rejected, matching the reference decoder's bound
        # (r8 ADVICE: `> 70` accepted an 11-byte encoding)
        if shift >= 70:
            raise DecodeError("varint too long")


def _iter_fields(data: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, raw_value) triples.

    raw_value: int for wire types 0/1/5, bytes for wire type 2.
    Unknown wire types raise; callers skip unknown *field numbers*.
    """
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        number, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(data, pos)
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                raise DecodeError("truncated length-delimited field")
            val = data[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                raise DecodeError("truncated fixed32 field")
            val = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        elif wt == 1:
            if pos + 8 > n:
                raise DecodeError("truncated fixed64 field")
            val = int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        else:
            raise DecodeError(f"unsupported wire type {wt} (field {number})")
        yield number, wt, val


def _signed(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


# --- descriptor model ------------------------------------------------------


class FieldDescriptor:
    """One field of a message type (subset of the real class)."""

    def __init__(
        self,
        name: str,
        number: int,
        ftype: int,
        label: int,
        type_name: str = "",
        oneof_index: int | None = None,
    ):
        if ftype not in _SUPPORTED:
            raise NotImplementedError(
                f"field {name!r}: proto type {ftype} is outside this mini-runtime's scope"
            )
        self.name = name
        self.number = number
        self.type = ftype
        self.label = label
        self.type_name = type_name
        self.oneof_index = oneof_index
        self.message_type: Descriptor | None = None  # resolved later

    @property
    def is_repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    def default(self) -> Any:
        if self.is_repeated:
            return []
        if self.type == TYPE_STRING:
            return ""
        if self.type == TYPE_BYTES:
            return b""
        if self.type == TYPE_BOOL:
            return False
        return 0


class Descriptor:
    """A message type (subset of the real class; also accepts the
    ``_serialized_start``/``_serialized_end`` attribute writes the
    generated modules perform)."""

    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.fields: list[FieldDescriptor] = []
        self.fields_by_name: dict[str, FieldDescriptor] = {}
        self.fields_by_number: dict[int, FieldDescriptor] = {}
        self.nested_types: list[Descriptor] = []
        self.enum_types: list[EnumDescriptor] = []
        self.oneofs: list[str] = []
        self._concrete_class: type | None = None

    def add_field(self, f: FieldDescriptor) -> None:
        self.fields.append(f)
        self.fields_by_name[f.name] = f
        self.fields_by_number[f.number] = f


class EnumDescriptor:
    def __init__(self, name: str, full_name: str):
        self.name = name
        self.full_name = full_name
        self.values_by_name: dict[str, int] = {}
        self.values_by_number: dict[int, str] = {}

    def add_value(self, name: str, number: int) -> None:
        self.values_by_name[name] = number
        self.values_by_number.setdefault(number, name)


class FileDescriptor:
    def __init__(self, name: str, package: str):
        self.name = name
        self.package = package
        self.message_types_by_name: dict[str, Descriptor] = {}
        self.enum_types_by_name: dict[str, EnumDescriptor] = {}
        # full-name index used to resolve field type_name references
        self._types_by_full_name: dict[str, Descriptor] = {}
        self._enums_by_full_name: dict[str, EnumDescriptor] = {}


# --- FileDescriptorProto bootstrap parser ----------------------------------
# Field numbers below are the public descriptor.proto schema.


def _parse_enum(data: bytes, prefix: str) -> EnumDescriptor:
    ed = EnumDescriptor("", "")
    for num, _wt, val in _iter_fields(data):
        if num == 1:
            ed.name = val.decode()
        elif num == 2:  # EnumValueDescriptorProto
            vname, vnum = "", 0
            for n2, _w2, v2 in _iter_fields(val):
                if n2 == 1:
                    vname = v2.decode()
                elif n2 == 2:
                    vnum = _signed(v2)
            ed.add_value(vname, vnum)
    ed.full_name = f"{prefix}.{ed.name}"
    return ed


def _parse_field(data: bytes) -> FieldDescriptor:
    name, number, label, ftype, type_name, oneof = "", 0, 1, 0, "", None
    for num, _wt, val in _iter_fields(data):
        if num == 1:
            name = val.decode()
        elif num == 3:
            number = _signed(val)
        elif num == 4:
            label = val
        elif num == 5:
            ftype = val
        elif num == 6:
            type_name = val.decode()
        elif num == 9:
            oneof = val  # presence on the wire == membership in a oneof
    return FieldDescriptor(name, number, ftype, label, type_name, oneof)


def _parse_message(data: bytes, prefix: str) -> Descriptor:
    name = ""
    fields: list[bytes] = []
    nested: list[bytes] = []
    enums: list[bytes] = []
    oneofs: list[str] = []
    for num, _wt, val in _iter_fields(data):
        if num == 1:
            name = val.decode()
        elif num == 2:
            fields.append(val)
        elif num == 3:
            nested.append(val)
        elif num == 4:
            enums.append(val)
        elif num == 8:  # OneofDescriptorProto
            oname = ""
            for n2, _w2, v2 in _iter_fields(val):
                if n2 == 1:
                    oname = v2.decode()
            oneofs.append(oname)
    full = f"{prefix}.{name}"
    md = Descriptor(name, full)
    md.oneofs = oneofs
    for fb in fields:
        md.add_field(_parse_field(fb))
    for nb in nested:
        md.nested_types.append(_parse_message(nb, full))
    for eb in enums:
        md.enum_types.append(_parse_enum(eb, full))
    return md


def parse_file_descriptor(serialized: bytes) -> FileDescriptor:
    name, package = "", ""
    messages: list[bytes] = []
    enums: list[bytes] = []
    for num, _wt, val in _iter_fields(serialized):
        if num == 1:
            name = val.decode()
        elif num == 2:
            package = val.decode()
        elif num == 4:
            messages.append(val)
        elif num == 5:
            enums.append(val)
        # dependencies/options/syntax are irrelevant to the wire format
    fd = FileDescriptor(name, package)
    prefix = f".{package}" if package else ""
    for mb in messages:
        md = _parse_message(mb, prefix)
        fd.message_types_by_name[md.name] = md
    for eb in enums:
        ed = _parse_enum(eb, prefix)
        fd.enum_types_by_name[ed.name] = ed

    def index(md: Descriptor) -> None:
        fd._types_by_full_name[md.full_name] = md
        for ed in md.enum_types:
            fd._enums_by_full_name[ed.full_name] = ed
        for nested in md.nested_types:
            index(nested)

    for md in fd.message_types_by_name.values():
        index(md)
    for ed in fd.enum_types_by_name.values():
        fd._enums_by_full_name[ed.full_name] = ed

    # resolve message-typed fields (all references are file-local in
    # the single-file schemas this runtime targets; fail loud if not)
    def resolve(md: Descriptor) -> None:
        for f in md.fields:
            if f.type == TYPE_MESSAGE:
                target = fd._types_by_full_name.get(f.type_name)
                if target is None:
                    raise NotImplementedError(
                        f"cross-file message reference {f.type_name!r} "
                        f"is outside this mini-runtime's scope"
                    )
                f.message_type = target
        for nested in md.nested_types:
            resolve(nested)

    for md in fd.message_types_by_name.values():
        resolve(md)
    return fd


# --- message runtime -------------------------------------------------------


class Message:
    """Base class for generated message types (``DESCRIPTOR`` is set
    on subclasses by the builder)."""

    DESCRIPTOR: Descriptor

    def __init__(self, **kwargs: Any):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", set())
        object.__setattr__(self, "_parent_hook", None)
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- presence plumbing --------------------------------------------------

    def _mark_present(self, fname: str) -> None:
        fd = self.DESCRIPTOR.fields_by_name[fname]
        if fd.oneof_index is not None:
            for other in self.DESCRIPTOR.fields:
                if other.oneof_index == fd.oneof_index and other.name != fname:
                    evicted = self._values.pop(other.name, None)
                    self._present.discard(other.name)
                    if isinstance(evicted, Message):
                        # a retained reference to the evicted child
                        # must not keep writing presence into us
                        object.__setattr__(evicted, "_parent_hook", None)
        self._present.add(fname)
        hook = self._parent_hook
        if hook is not None:
            parent, pname = hook
            # a oneof switch or a parse-reset may have detached us
            # from the parent after this reference was handed out;
            # only a child the parent still holds may mark presence
            if parent._values.get(pname) is self:
                parent._mark_present(pname)
            else:
                object.__setattr__(self, "_parent_hook", None)

    # -- attribute protocol -------------------------------------------------

    def __getattr__(self, name: str):
        # only called when not found normally
        if name.startswith("_"):
            raise AttributeError(name)
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(f"{self.DESCRIPTOR.full_name} has no field {name!r}")
        if name in self._values:
            return self._values[name]
        if fd.is_repeated:
            val: Any = []
            self._values[name] = val  # live container; presence = non-empty
            return val
        if fd.type == TYPE_MESSAGE:
            child = fd.message_type._concrete_class()  # type: ignore[union-attr]
            object.__setattr__(child, "_parent_hook", (self, name))
            self._values[name] = child  # presence only once a field is SET
            return child
        return fd.default()

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(f"{self.DESCRIPTOR.full_name} has no field {name!r}")
        if fd.type == TYPE_MESSAGE and not fd.is_repeated:
            if not isinstance(value, Message):
                raise TypeError(f"{name} expects a message, got {type(value).__name__}")
            replaced = self._values.get(name)
            if isinstance(replaced, Message) and replaced is not value:
                object.__setattr__(replaced, "_parent_hook", None)
            object.__setattr__(value, "_parent_hook", (self, name))
        if fd.type == TYPE_STRING and isinstance(value, bytes):
            value = value.decode("utf-8")
        self._values[name] = value
        self._mark_present(name)

    def HasField(self, name: str) -> bool:
        return name in self._present

    def WhichOneof(self, oneof_name: str) -> str | None:
        idx = self.DESCRIPTOR.oneofs.index(oneof_name)
        for f in self.DESCRIPTOR.fields:
            if f.oneof_index == idx and f.name in self._present:
                return f.name
        return None

    def CopyFrom(self, other: "Message") -> None:
        self.ParseFromString(other.SerializeToString())

    # -- wire ---------------------------------------------------------------

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            name = fd.name
            if fd.is_repeated:
                for item in self._values.get(name, ()):
                    self._emit(out, fd, item)
                continue
            if fd.type == TYPE_MESSAGE or fd.oneof_index is not None:
                if name not in self._present:
                    continue
                value = self._values.get(name)
                if fd.type == TYPE_MESSAGE and not isinstance(value, Message):
                    # present-but-unstored (defensive): an empty child
                    value = fd.message_type._concrete_class()  # type: ignore[union-attr]
                self._emit(out, fd, value if value is not None else fd.default())
                continue
            value = self._values.get(name, fd.default())
            if value == fd.default():
                continue  # proto3: scalars at default are omitted
            self._emit(out, fd, value)
        return bytes(out)

    def _emit(self, out: bytearray, fd: FieldDescriptor, value: Any) -> None:
        if fd.type in _VARINT_TYPES:
            _write_varint(out, (fd.number << 3) | 0)
            _write_varint(out, int(value))
        elif fd.type == TYPE_MESSAGE:
            payload = value.SerializeToString()
            _write_varint(out, (fd.number << 3) | 2)
            _write_varint(out, len(payload))
            out += payload
        else:  # string / bytes
            payload = value.encode("utf-8") if isinstance(value, str) else bytes(value)
            _write_varint(out, (fd.number << 3) | 2)
            _write_varint(out, len(payload))
            out += payload

    def ParseFromString(self, data: bytes) -> int:
        for old in self._values.values():
            if isinstance(old, Message):
                # a retained reference to a pre-parse child must not
                # keep writing presence into this message
                object.__setattr__(old, "_parent_hook", None)
        self._values.clear()
        self._present.clear()
        self.MergeFromString(data)
        return len(data)

    def MergeFromString(self, data: bytes) -> None:
        for number, wt, raw in _iter_fields(bytes(data)):
            fd = self.DESCRIPTOR.fields_by_number.get(number)
            if fd is None:
                continue  # unknown field: skip (forward compatibility)
            if fd.is_repeated:
                lst = getattr(self, fd.name)
                if fd.type in _VARINT_TYPES and wt == 2:
                    pos = 0  # packed scalars
                    while pos < len(raw):
                        v, pos = _read_varint(raw, pos)
                        lst.append(self._decode_scalar(fd, v))
                elif fd.type == TYPE_MESSAGE:
                    child = fd.message_type._concrete_class()  # type: ignore[union-attr]
                    child.MergeFromString(raw)
                    lst.append(child)
                else:
                    lst.append(self._decode_value(fd, raw))
                if lst:
                    self._present.add(fd.name)
            elif fd.type == TYPE_MESSAGE:
                # repeated occurrences of a singular message field MERGE
                # field-by-field (the concatenation rule of the spec),
                # so reuse an existing child rather than replacing it
                child = self._values.get(fd.name)
                if not isinstance(child, Message):
                    child = fd.message_type._concrete_class()  # type: ignore[union-attr]
                    object.__setattr__(child, "_parent_hook", (self, fd.name))
                    self._values[fd.name] = child
                child.MergeFromString(raw)
                self._mark_present(fd.name)
            else:
                self._values[fd.name] = self._decode_value(fd, raw)
                self._mark_present(fd.name)

    def _decode_value(self, fd: FieldDescriptor, raw: Any) -> Any:
        if fd.type == TYPE_STRING:
            return raw.decode("utf-8")
        if fd.type == TYPE_BYTES:
            return bytes(raw)
        return self._decode_scalar(fd, raw)

    @staticmethod
    def _decode_scalar(fd: FieldDescriptor, v: int) -> Any:
        if fd.type == TYPE_BOOL:
            return bool(v)
        if fd.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
            return _signed(v)  # enums are int32 on the wire
        return v  # uint32/uint64

    def __repr__(self) -> str:  # debugging aid, not the text format
        body = ", ".join(f"{k}={self._values[k]!r}" for k in sorted(self._present))
        return f"{self.DESCRIPTOR.name}({body})"


# --- class building (what internal.builder drives) -------------------------


def build_message_class(md: Descriptor) -> type:
    attrs: dict[str, Any] = {"DESCRIPTOR": md, "__module__": __name__}
    for nested in md.nested_types:
        attrs[nested.name] = build_message_class(nested)
    for ed in md.enum_types:
        for vname, vnum in ed.values_by_name.items():
            attrs[vname] = vnum
    cls = type(md.name, (Message,), attrs)
    md._concrete_class = cls
    return cls


def descriptor_key(md: Descriptor, package: str) -> str:
    """The ``_MESSAGENAME`` / ``_OUTER_NESTED`` globals key protoc
    generates for a descriptor."""
    local = md.full_name[len(package) + 2 :] if package else md.full_name.lstrip(".")
    return "_" + local.replace(".", "_").upper()
