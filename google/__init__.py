"""Namespace package for the vendored mini-protobuf runtime (see
google/protobuf/__init__.py). ``extend_path`` keeps this cooperative:
if a real ``google.*`` distribution appears on sys.path later, its
subpackages remain importable alongside this one."""

from pkgutil import extend_path

__path__ = extend_path(__path__, __name__)
