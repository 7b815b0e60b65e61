"""Storage-agnostic small-file I/O for connector state artifacts.

Two connector features persist tiny driver-side files between runs:
the streaming sink's reject side table (`datasource.SfIngestStreamWriter`)
and the incremental extractor's watermark state (`incremental`). On a
real cluster those paths live on object storage (s3a/abfs/gs), which
``os.*`` cannot address — and the Python DataSource ``commit()`` hook
has no SparkSession to write through. ``pyarrow.fs`` (shipped with
PySpark) is the abstraction both use: URIs resolve via
``FileSystem.from_uri``; scheme-less relative paths fall back to the
local filesystem.
"""

from __future__ import annotations

import os


def filesystem_for(path: str):
    """Resolve *path* to a ``(pyarrow.fs.FileSystem, fs-native path)``
    pair — ``file://``, ``s3://``, ``gs://``, ``hdfs://`` or a bare
    local path (LocalFileSystem fallback for scheme-less relative
    paths, which ``from_uri`` rejects).

    On LocalFileSystem/HDFS a tmp+``move`` is an atomic rename; on
    object stores ``move`` is copy+delete — not atomic, but fixed
    per-artifact names still converge on replay (overwrite semantics),
    which is the contract callers rely on.
    """
    from pyarrow import fs as pafs

    try:
        return pafs.FileSystem.from_uri(path)
    except Exception:  # scheme-less relative path -> local filesystem
        return pafs.LocalFileSystem(), os.path.abspath(path)


def read_small_file(path: str) -> bytes | None:
    """Read a small artifact in full; None when it does not exist."""
    from pyarrow.fs import FileType

    fs, p = filesystem_for(path)
    if fs.get_file_info(p).type == FileType.NotFound:
        return None
    with fs.open_input_stream(p) as f:
        return f.read()


def write_small_file_atomic(path: str, payload: bytes) -> None:
    """Write a small artifact via tmp + move (atomic on local/HDFS,
    overwrite-converged on object stores); parent dirs are created."""
    fs, p = filesystem_for(path)
    parent = p.rsplit("/", 1)[0] if "/" in p else ""
    if parent:
        fs.create_dir(parent, recursive=True)
    tmp = p + ".tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(payload)
    fs.move(tmp, p)
