"""Internal helpers consumed by protoc-generated modules (mini-runtime)."""
