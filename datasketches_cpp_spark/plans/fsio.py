"""Filesystem facade for checkpoint manifest/lineage I/O, routed through
the Hadoop FileSystem API of the live SparkSession's JVM gateway.

Why this exists: StageCheckpointer's manifests and lineage log are the
resume commit points (plans/checkpoint.py). In round 2 they used os/shutil
primitives, which silently restricted the whole resume mechanism to local
roots — the parquet data writes already went through Spark and would work
on any URI. Routing the *bookkeeping* through
``org.apache.hadoop.fs.FileSystem`` (the exact API Spark itself uses to
commit parquet jobs) makes the checkpoint root scheme-agnostic: whatever
URI Spark can write a snapshot to (file://, hdfs://, s3a://, abfs://...),
the manifest beside it works too, with the same atomic-rename commit
discipline HDFS gives Spark's own _SUCCESS markers.

Design constraints honored:

* **Metadata-only resume validation** is preserved: existence + length come
  from ``FileStatus`` (one listStatus call per directory), never a data
  scan.
* **Parquet row counts without a data scan**: `ParquetFooterFile` is a
  Python file-like over ``FSDataInputStream`` seek + ``readNBytes`` (Java
  11+ InputStream), so ``pyarrow.parquet.ParquetFile`` can parse just the
  footer of a remote part-file. ``readNBytes`` returns ``byte[]``, which
  py4j passes back by value as Python bytes in a single roundtrip — no
  per-element gateway traffic.
* **Atomic manifest publish**: write to ``<path>.tmp`` then rename. On
  HDFS-like stores rename is atomic; we first try the FileContext
  overwrite-rename (the atomic primitive), falling back to
  delete-then-rename where FileContext is unavailable.
* **Append-free lineage log**: not every FileSystem supports append (raw
  local and object stores don't), so appends are read-concat-rewrite under
  the same atomic rename. Lineage records are one small JSON line per
  stage event; the log stays KB-sized for any realistic pipeline run.

The reference analog: a serialized sketch is bytes plus a seed-hash check
(theta_union_base_impl.hpp:41-42); here a committed stage is a parquet
snapshot plus a fingerprint-checked manifest, and this module is the byte
transport underneath that contract.
"""

from __future__ import annotations


class FsResolutionError(ValueError):
    """The root URI's scheme has no registered Hadoop FileSystem — fail at
    construction, not mid-pipeline (mirrors the reference's fail-fast
    deserialize hardening)."""


class HadoopFS:
    """Thin facade over org.apache.hadoop.fs.FileSystem via py4j."""

    def __init__(self, spark, root_uri: str):
        self._spark = spark
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        jroot = self._Path(root_uri)
        try:
            # newInstance, NOT get: a private (uncached) FileSystem we may
            # reconfigure without mutating the JVM-wide instance Spark's own
            # jobs share.
            self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.newInstance(
                jroot.toUri(), self._conf
            )
        except Exception as exc:  # py4j wraps the Java IOException
            scheme = root_uri.split("://", 1)[0] if "://" in root_uri else ""
            raise FsResolutionError(
                f"no Hadoop FileSystem for checkpoint root {root_uri!r} "
                f"(scheme {scheme!r}): {exc}"
            ) from exc
        # Manifests are tiny JSON commit markers: local-FS .crc sidecars add
        # nothing (parquet data has its own footer checksums) and a stale
        # sidecar after an out-of-band edit would turn "torn manifest ⇒
        # recompute" into a hard ChecksumException. Only our private
        # instance is affected.
        for setter in ("setWriteChecksum", "setVerifyChecksum"):
            try:
                getattr(self._fs, setter)(False)
            except Exception:
                pass  # not every FileSystem supports checksum toggles
        self.root = root_uri

    def close(self) -> None:
        """Release the private FileSystem instance (thread pools /
        connections on s3a/abfs). Safe to call twice. newInstance-created
        filesystems are NOT in Hadoop's cache, so nothing else is
        affected — but they also are never closed for us, hence this."""
        fs, self._fs = getattr(self, "_fs", None), None
        if fs is not None:
            try:
                fs.close()
            except Exception:
                pass  # double-close / already-shut-down gateway

    def __enter__(self) -> "HadoopFS":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- path helpers --------------------------------------------------------
    def jpath(self, path: str):
        return self._Path(path)

    @staticmethod
    def join(*segs: str) -> str:
        """URI-safe join (os.path.join would also work on posix, but be
        explicit: no scheme mangling, no backslashes)."""
        out = segs[0].rstrip("/")
        for s in segs[1:]:
            out += "/" + s.strip("/")
        return out

    # -- metadata ------------------------------------------------------------
    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self.jpath(path)))

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self.jpath(path)).getLen())

    def list_files(self, dir_path: str) -> list[tuple[str, int]]:
        """[(name, bytes)] for regular files directly under dir_path,
        name-sorted. One listStatus call; length rides the FileStatus."""
        if not self.exists(dir_path):
            return []
        out = []
        for st in self._fs.listStatus(self.jpath(dir_path)):
            if st.isFile():
                out.append((st.getPath().getName(), int(st.getLen())))
        return sorted(out)

    def list_dirs(self, dir_path: str) -> list[str]:
        """Names of immediate subdirectories, name-sorted."""
        if not self.exists(dir_path):
            return []
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(self.jpath(dir_path))
            if st.isDirectory()
        )

    def has_file_with_suffix(self, dir_path: str, suffix: str) -> bool:
        """True iff any file under dir_path (recursive) ends with suffix.
        Early-exits the RemoteIterator on first hit — no full listing."""
        if not self.exists(dir_path):
            return False
        it = self._fs.listFiles(self.jpath(dir_path), True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(suffix):
                return True
        return False

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self.jpath(path))

    def delete(self, path: str, recursive: bool = True) -> None:
        self._fs.delete(self.jpath(path), recursive)

    # -- bytes ---------------------------------------------------------------
    @staticmethod
    def _read_range(stream, pos: int, n: int) -> bytes:
        """Seek + readNBytes → Python bytes in two gateway roundtrips
        (readNBytes returns byte[], which py4j passes back by value)."""
        stream.seek(pos)
        return bytes(stream.readNBytes(n))

    def read_bytes(self, path: str) -> bytes:
        n = self.size(path)
        stream = self._fs.open(self.jpath(path))
        try:
            return self._read_range(stream, 0, n) if n else b""
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        """Non-atomic create-overwrite (py4j passes bytes as byte[] by
        value). Use write_bytes_atomic for commit points."""
        out = self._fs.create(self.jpath(path), True)
        try:
            if data:
                out.write(data)
        finally:
            out.close()

    def rename_overwrite(self, src: str, dst: str) -> None:
        """Atomic where the store supports FileContext rename-OVERWRITE
        (HDFS, local). On stores WITHOUT it (e.g. s3a) the fallback is
        delete-then-rename, which has a crash window: if the process dies
        after the delete and before the rename, a previously committed dst
        is gone and the stage silently downgrades to recompute (never to
        corruption — load_manifest treats a missing manifest as
        incomplete). The fallback tries a plain rename first so the window
        only exists when dst already exists (i.e. on re-commit), and
        verifies dst after the rename. Object-store deployments that need
        a crash-proof commit should point the checkpoint root at a store
        with atomic rename, or accept the recompute-on-crash semantics."""
        jsrc, jdst = self.jpath(src), self.jpath(dst)
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                jdst.toUri(), self._conf
            )
            opts = self._gateway.new_array(
                self._jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            opts[0] = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            fc.rename(jsrc, jdst, opts)
        except Exception:
            # plain rename first: succeeds when dst is absent, no window
            if not self._fs.rename(jsrc, jdst):
                if self._fs.exists(jdst):
                    self._fs.delete(jdst, False)  # <- crash window starts
                if not self._fs.rename(jsrc, jdst):
                    raise IOError(f"rename {src} -> {dst} failed")
            if not self._fs.exists(jdst):
                raise IOError(f"rename {src} -> {dst} left no destination")

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        tmp = path + ".tmp"
        self.write_bytes(tmp, data)
        self.rename_overwrite(tmp, path)

    def append_line(self, path: str, line: str) -> None:
        """Portable append: try the FileSystem's native append (HDFS), fall
        back to read-concat-atomic-rewrite (raw local FS and object stores
        refuse append)."""
        payload = (line.rstrip("\n") + "\n").encode()
        jp = self.jpath(path)
        if self._fs.exists(jp):
            try:
                out = self._fs.append(jp)
                try:
                    out.write(payload)
                finally:
                    out.close()
                return
            except Exception:
                # the failed native append may have PARTIALLY landed
                # (write ok, close threw): re-read and repair before the
                # rewrite — drop a torn trailing fragment (bytes after
                # the last newline) and skip the concat entirely if the
                # line already fully landed, so the log never carries a
                # duplicate or an invalid JSONL record
                existing = self.read_bytes(path)
                if existing.endswith(payload):
                    payload = existing
                else:
                    cut = existing.rfind(b"\n") + 1
                    payload = existing[:cut] + payload
        self.write_bytes_atomic(path, payload)

    # -- parquet footers -------------------------------------------------------
    def parquet_num_rows(self, path: str) -> int:
        """Row count from the parquet footer only — FSDataInputStream
        positioned reads through a file-like, no column data touched."""
        import pyarrow.parquet as pq

        f = ParquetFooterFile(self, path)
        try:
            return pq.ParquetFile(f).metadata.num_rows
        finally:
            f.close()


class ParquetFooterFile:
    """Read-only seekable file-like over a Hadoop path, for pyarrow footer
    parsing. Every read() is a positioned readFully — safe for the
    seek-to-end access pattern of parquet metadata."""

    def __init__(self, fs: HadoopFS, path: str):
        self._fs = fs
        self._size = fs.size(path)
        self._stream = fs._fs.open(fs.jpath(path))
        self._pos = 0
        self.closed = False

    # file protocol ------------------------------------------------------------
    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        data = self._fs._read_range(self._stream, self._pos, n)
        self._pos += n
        return data

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._size

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def flush(self) -> None:
        pass

    def close(self) -> None:
        if not self.closed:
            self._stream.close()
            self.closed = True
