"""Filesystem capability shim — the ONE place that touches the JVM
gateway for Hadoop FileSystem access.

The engine's index/merge/compaction/versioned-table paths need a handful
of filesystem primitives (exists / delete / rename / exclusive create /
read / list) on WHATEVER scheme Spark writes to (``file:``, ``hdfs:``,
``s3a:`` …).  Classic PySpark exposes the JVM gateway (``spark._jvm``);
Spark Connect does not.  Routing every touchpoint through this module
means:

- classic PySpark → the Hadoop ``FileSystem`` API, so every primitive
  works on the same scheme the data files went to (the discipline the
  rest of the tree already follows — a driver-local ``os.path`` check
  against an ``s3a://`` table silently answers about the wrong disk);
- Spark Connect (no ``_jvm``) → a pure-Python fallback for local /
  ``file:``-scheme paths, and a LOUD ``NotImplementedError`` for remote
  schemes it cannot reach (never a silent wrong answer).

Exclusive create (``write_bytes(..., overwrite=False)``) is the CAS
primitive the versioned-table commit protocol builds on: on HDFS
``FileSystem.create(path, false)`` is an atomic namespace operation; on
the local scheme both backends use an O_EXCL-style create.  True
object stores want a conditional PUT (If-None-Match) here — S3A exposes
that through the same ``create(overwrite=false)`` call on recent Hadoop
versions; older versions degrade to check-then-create, which is why the
commit protocol also tolerates and repairs broken half-written claims
(see sources/versioned.py).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse


def _local_path(path: str) -> str | None:
    """The local-filesystem path for ``path``, or None when the scheme
    is not local.  Windows drive letters are not schemes we expect on a
    Spark cluster; treat a single-letter scheme as a plain path."""
    parsed = urlparse(path)
    if parsed.scheme in ("", "file") or len(parsed.scheme) == 1:
        return parsed.path if parsed.scheme == "file" else path
    return None


class LocalFS:
    """Pure-Python primitives over the local filesystem (``file:`` or
    scheme-less paths) — the Spark Connect fallback."""

    def _p(self, path: str) -> str:
        p = _local_path(path)
        if p is None:
            raise NotImplementedError(
                f"no JVM gateway available and {path!r} is not a local "
                "path; filesystem access to remote schemes requires "
                "classic PySpark (Hadoop FileSystem API)"
            )
        return p

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def delete(self, path: str, recursive: bool = True) -> bool:
        p = self._p(path)
        if not os.path.exists(p):
            return False
        if os.path.isdir(p):
            if not recursive:
                os.rmdir(p)
            else:
                import shutil

                shutil.rmtree(p)
        else:
            os.remove(p)
        return True

    def rename(self, src: str, dst: str) -> bool:
        s, d = self._p(src), self._p(dst)
        if not os.path.exists(s):
            return False
        try:
            os.replace(s, d)
        except OSError:
            return False
        return True

    def mkdirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes, overwrite: bool = True) -> None:
        p = self._p(path)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        # Both modes write the FULL bytes to a private temp file first,
        # then publish the name atomically — overwrite via os.replace,
        # exclusive create via os.link (fails EEXIST if claimed).  The
        # link form makes name-appearance atomic WITH content: a
        # concurrent committer losing the race always reads the winner's
        # complete manifest, never a name whose bytes haven't landed yet
        # (the O_CREAT|O_EXCL-then-write sequence had that window — the
        # loser would see an empty file, treat it as a torn claim, and
        # delete the winner's in-flight commit).
        tmp = f"{p}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        if overwrite:
            os.replace(tmp, p)
        else:
            try:
                os.link(tmp, p)
            except FileExistsError:
                raise
            except OSError:
                # filesystems without hard links (rare locally): fall
                # back to O_EXCL create of the finished bytes — still a
                # single write syscall of complete content
                fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                    f.flush()
                    os.fsync(f.fileno())
            finally:
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    def list_names(self, path: str) -> list[str]:
        p = self._p(path)
        if not os.path.isdir(p):
            return []
        return sorted(os.listdir(p))

    def list_dir_names(self, path: str) -> list[str]:
        p = self._p(path)
        if not os.path.isdir(p):
            return []
        return sorted(
            n for n in os.listdir(p) if os.path.isdir(os.path.join(p, n))
        )


class HadoopFS:
    """Primitives over the Hadoop ``FileSystem`` resolved for a path's
    scheme — the classic-PySpark backend (works on file/hdfs/s3a/…)."""

    def __init__(self, spark, path: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        # a PRIVATE FileSystem instance (not the JVM-wide cached one) with
        # checksum sidecars off: the shim's metadata files are small
        # self-validating JSON/text that other backends (the pure-Python
        # local fallback) may rewrite in place — a stale Hadoop ``.crc``
        # sidecar would then fail every later read with ChecksumException.
        # Spark's own cached FileSystem keeps its checksums untouched.
        uri = self._path(path).toUri()
        key = (str(uri.getScheme()), str(uri.getAuthority()))
        cache = getattr(spark, "_asid_fsio_cache", None)
        if cache is None:
            cache = {}
            try:
                spark._asid_fsio_cache = cache
            except AttributeError:
                pass
        fs = cache.get(key)
        if fs is None:
            fs = self._jvm.org.apache.hadoop.fs.FileSystem.newInstance(
                uri, self._conf
            )
            fs.setWriteChecksum(False)
            fs.setVerifyChecksum(False)
            cache[key] = fs
        self._fs = fs

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._path(path)))

    def delete(self, path: str, recursive: bool = True) -> bool:
        return bool(self._fs.delete(self._path(path), recursive))

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._path(src), self._path(dst)))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._path(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False
            )
            return bytes(baos.toByteArray())
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes, overwrite: bool = True) -> None:
        p = self._path(path)
        if not overwrite and self._fs.exists(p):
            # create(path, false) raises JVM-side anyway; pre-raising a
            # Python FileExistsError gives callers one exception type.
            # On HDFS the create itself is the atomic check (namespace
            # op); on local/object-store schemes this is check-then-act
            # — see module docstring for why the commit protocol
            # tolerates that.
            raise FileExistsError(path)
        try:
            stream = self._fs.create(p, overwrite)
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            if "ExistsException" in str(e) or "already exists" in str(e):
                raise FileExistsError(path) from e
            raise
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def list_names(self, path: str) -> list[str]:
        p = self._path(path)
        if not self._fs.exists(p):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(p)
        )

    def list_dir_names(self, path: str) -> list[str]:
        p = self._path(path)
        if not self._fs.exists(p):
            return []
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(p)
            if st.isDirectory()
        )


def get_fs(spark, path: str):
    """The filesystem backend for ``path``: Hadoop FS via the JVM
    gateway when available (classic PySpark), pure-Python local
    otherwise (Spark Connect — remote schemes raise loudly)."""
    if spark is not None and getattr(spark, "_jvm", None) is not None:
        try:
            return HadoopFS(spark, path)
        except Exception:
            # a Connect session may expose a stub attribute; fall back
            pass
    return LocalFS()
