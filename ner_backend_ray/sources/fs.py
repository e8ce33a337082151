"""Filesystem seam — local paths AND fsspec URLs / pyarrow filesystems.

The reference runs its full pipeline against an S3-compatible object store
(internal/integration_tests/s3_test.go:58-293, MinIO) through one storage
interface (internal/storage/s3_connector.go, local_connector.go). The Ray-native
equivalent is pyarrow's FileSystem abstraction: every ``ray.data.read_*`` /
``write_*`` accepts ``filesystem=``, and artifact (model dir) I/O goes through
fsspec so ``memory://`` / ``s3://`` URLs work wherever a local path works.

No network in this sandbox, so tests exercise the seam with fsspec's in-memory
filesystem (driver-side artifact store) and a ``DirFileSystem`` wrapped in
``PyFileSystem(FSSpecHandler(...))`` for Ray reads — the latter pickles to
worker processes, proving the filesystem object actually threads through the
distributed read path rather than being resolved driver-side.
"""

from __future__ import annotations

import os
import posixpath
from typing import IO


def is_url(path: str) -> bool:
    return "://" in path


def join(base: str, *parts: str) -> str:
    """Path join that keeps fsspec URLs intact (os.path.join would not harm
    POSIX, but keep Windows-style separators out of object-store keys)."""
    if is_url(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def open_file(path: str, mode: str = "r") -> IO:
    """open() for local paths, fsspec.open() for URLs (memory://, s3://, ...)."""
    if is_url(path):
        import fsspec
        return fsspec.open(path, mode).open()
    return open(path, mode)


def makedirs(path: str) -> None:
    if is_url(path):
        import fsspec
        fs, p = fsspec.core.url_to_fs(path)
        fs.makedirs(p, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def wrap_for_arrow(fs):
    """fsspec filesystem → pyarrow FileSystem (what ray.data expects).
    Pass-through for None / already-pyarrow filesystems."""
    if fs is None:
        return None
    import pyarrow.fs as pafs
    if isinstance(fs, pafs.FileSystem):
        return fs
    return pafs.PyFileSystem(pafs.FSSpecHandler(fs))
