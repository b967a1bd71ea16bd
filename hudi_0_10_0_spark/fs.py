"""Filesystem access via the Hadoop FileSystem API (py4j).

All metadata I/O goes through ``org.apache.hadoop.fs.FileSystem`` so the
engine works unchanged on local FS, HDFS, or object stores — the same
abstraction level the reference uses (``common/fs/FSUtils.java``).
Data I/O never comes through here; it is always Spark's parquet source.

Atomicity: completed timeline instants are produced by write-to-temp +
rename, matching the reference's create-immutable-file-in-metadata-path
protocol (``common/table/timeline/HoodieActiveTimeline.java``).
"""

from __future__ import annotations

import os
import shutil


class FS:
    def __init__(self, spark, base_uri: str):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._base_uri = base_uri
        self._fs = self._Path(base_uri).getFileSystem(self._conf)
        self._fc = None  # lazy FileContext for atomic rename-overwrite
        self._fc_failed = False  # no AbstractFileSystem binding → fall back
        # Local fast path (optimization r9, guide §4: eliminate the
        # JVM boundary): when the RESOLVED filesystem is the local one,
        # metadata ops run as direct Python syscalls instead of py4j
        # round trips — a single list_names through Hadoop costs
        # 2+2·children gateway calls (~0.5 ms each), and a commit does
        # dozens of listings/reads, so the boundary dominated the
        # per-commit driver floor (measured ~16 s of an 18.6 s
        # 8-commit profile inside socket.recv_into). Semantics are
        # matched to RawLocalFileSystem call-for-call (POSIX rename(2)
        # replace behavior, False-on-missing delete, "file:" URIs from
        # recursive listings); any path carrying a non-local scheme
        # still routes through Hadoop.
        self._is_local = self._resolved_scheme() in ("file", "")

    def _lp(self, p: str) -> str | None:
        """Local-filesystem path for ``p``, or None when the path must
        go through the Hadoop API (non-local scheme). Mirrors
        create_exclusive's resolution rule: an explicit file: scheme is
        always local; a scheme-less path is local iff the RESOLVED
        filesystem (fs.defaultFS) is."""
        if p.startswith("file:"):
            return "/" + p[len("file:"):].lstrip("/")
        if self._is_local and "://" not in p:
            return p
        return None

    # -- basic ops ---------------------------------------------------------
    def path(self, p: str):
        return self._Path(p)

    def _resolved_scheme(self) -> str:
        """Scheme of the Hadoop FileSystem scheme-less paths resolve to
        (``fs.defaultFS``-derived). ``file`` / empty means local."""
        try:
            s = self._fs.getUri().getScheme()
            return s if s is not None else ""
        except Exception:
            return ""

    def exists(self, p: str) -> bool:
        lp = self._lp(p)
        if lp is not None:
            return os.path.exists(lp)
        return self._fs.exists(self._Path(p))

    def mkdirs(self, p: str) -> None:
        lp = self._lp(p)
        if lp is not None:
            os.makedirs(lp, exist_ok=True)
            return
        self._fs.mkdirs(self._Path(p))

    def is_dir(self, p: str) -> bool:
        lp = self._lp(p)
        if lp is not None:
            return os.path.isdir(lp)
        try:
            return self._fs.getFileStatus(self._Path(p)).isDirectory()
        except Exception:
            return False

    def delete(self, p: str, recursive: bool = False) -> bool:
        lp = self._lp(p)
        if lp is not None:
            # Hadoop contract: False when the path does not exist
            # (including losing a concurrent-delete race); IOException
            # (here: OSError) on a non-empty dir without recursive
            try:
                if os.path.isdir(lp) and not os.path.islink(lp):
                    if recursive:
                        shutil.rmtree(lp)
                    else:
                        os.rmdir(lp)
                else:
                    os.remove(lp)
                return True
            except FileNotFoundError:
                return False
        return self._fs.delete(self._Path(p), recursive)

    def rename(self, src: str, dst: str) -> bool:
        lsrc, ldst = self._lp(src), self._lp(dst)
        if lsrc is not None and ldst is not None:
            # RawLocalFileSystem.rename delegates to POSIX rename(2):
            # an existing FILE dst is silently replaced, failures (src
            # missing, dst a non-empty dir, ...) return False
            try:
                os.rename(lsrc, ldst)
                return True
            except OSError:
                return False
        return self._fs.rename(self._Path(src), self._Path(dst))

    def rename_overwrite(self, src: str, dst: str) -> None:
        """Replace ``dst`` with ``src``, ATOMICALLY where the store
        supports it: ``FileContext.rename(..., Options.Rename.OVERWRITE)``
        is a single syscall on local/HDFS — no window with no file at
        ``dst``. The FileContext is bound to the TABLE's filesystem URI
        (not fs.defaultFS, which could name a different store for
        scheme-less paths). Stores with no AbstractFileSystem binding
        (s3a://, gs:// by default) fall back to delete+rename — the
        pre-existing best-effort behavior, remembered so the probe isn't
        repeated per call."""
        lsrc, ldst = self._lp(src), self._lp(dst)
        if lsrc is not None and ldst is not None:
            # os.replace IS rename(2) with overwrite — the same single
            # atomic syscall FileContext.rename(OVERWRITE) issues on the
            # local store
            os.replace(lsrc, ldst)
            return
        if not self._fc_failed:
            try:
                self._fc_rename(src, dst, overwrite=True)
                return
            except Exception as e:
                # only fall back when FileContext itself is unsupported
                # for this store; a real rename failure must surface
                msg = str(e)
                if (
                    "UnsupportedFileSystem" not in msg
                    and "AbstractFileSystem" not in msg
                ):
                    raise
                self._fc_failed = True
        if self.exists(dst):
            self.delete(dst)
        if not self.rename(src, dst):
            raise IOError(f"rename failed: {src} -> {dst}")

    def _fc_rename(self, src: str, dst: str, overwrite: bool) -> None:
        if self._fc is None:
            FC = self._jvm.org.apache.hadoop.fs.FileContext
            self._fc = FC.getFileContext(
                self._Path(self._base_uri).toUri(), self._conf
            )
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gateway.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE if overwrite else Rename.NONE
        self._fc.rename(self._Path(src), self._Path(dst), opts)

    def rename_noreplace(self, src: str, dst: str) -> bool:
        """Rename that FAILS (returns False) when ``dst`` exists — the
        create-once timeline contract. ``FileSystem.rename`` cannot be
        trusted for this: Hadoop's RawLocalFileSystem maps it to POSIX
        rename, which silently REPLACES an existing destination
        (code-review r6), so two writers racing the same instant file
        would both believe they created it. FileContext.rename with the
        default (no-overwrite) option enforces the check on every store;
        stores with no AbstractFileSystem binding fall back to
        exists+rename (best-effort, as before)."""
        lsrc, ldst = self._lp(src), self._lp(dst)
        if lsrc is not None and ldst is not None:
            # hard-link-then-unlink: link(2) fails EEXIST atomically when
            # dst exists — the same create-once guarantee FileContext's
            # no-overwrite rename provides, without a JVM round trip.
            # Directories cannot be hard-linked; fall through to the
            # Hadoop path for them (write_text_atomic only moves files)
            if not os.path.isdir(lsrc):
                try:
                    os.link(lsrc, ldst)
                except FileExistsError:
                    return False
                os.unlink(lsrc)
                return True
        if not self._fc_failed:
            try:
                self._fc_rename(src, dst, overwrite=False)
                return True
            except Exception as e:
                msg = str(e)
                if (
                    "UnsupportedFileSystem" in msg
                    or "AbstractFileSystem" in msg
                ):
                    self._fc_failed = True
                elif "AlreadyExists" in msg or "already exists" in msg.lower():
                    return False
                else:
                    raise
        if self.exists(dst):
            return False
        return self.rename(src, dst)

    def copy_file(self, src: str, dst: str) -> None:
        """Stream-copy one file (``org.apache.hadoop.fs.FileUtil.copy``
        — no driver-memory buffering). ``dst`` parents are created; an
        existing ``dst`` is an error (create-once, like the reference's
        snapshot copy)."""
        lsrc, ldst = self._lp(src), self._lp(dst)
        if lsrc is not None and ldst is not None:
            if os.path.exists(ldst):
                raise FileExistsError(dst)
            os.makedirs(os.path.dirname(ldst) or "/", exist_ok=True)
            shutil.copyfile(lsrc, ldst)
            return
        dst_fs = self._Path(dst).getFileSystem(self._conf)
        if dst_fs.exists(self._Path(dst)):
            raise FileExistsError(dst)
        ok = self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._fs, self._Path(src), dst_fs, self._Path(dst), False, self._conf
        )
        if not ok:
            raise IOError(f"copy {src} -> {dst} failed")

    def list_names(self, p: str) -> list[str]:
        """Names of direct children of directory ``p`` (empty if missing)."""
        lp = self._lp(p)
        if lp is not None:
            try:
                return os.listdir(lp)
            except FileNotFoundError:
                return []
            except NotADirectoryError:
                # Hadoop listStatus(file) → the file itself
                return [os.path.basename(lp)]
        if not self.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(self._Path(p))]

    def _walk_local(self, lp: str) -> list[tuple[str, os.stat_result]]:
        """(file_uri, stat) for every file under ``lp`` — one scandir
        pass; URIs carry the ``file:`` scheme exactly like Hadoop's
        ``Path.toString`` so downstream parsers see identical strings."""
        out: list[tuple[str, os.stat_result]] = []
        if os.path.isfile(lp):
            return [(f"file:{os.path.abspath(lp)}", os.stat(lp))]
        for root, _dirs, files in os.walk(lp):
            for name in files:
                fp = os.path.join(root, name)
                try:
                    out.append((f"file:{os.path.abspath(fp)}", os.stat(fp)))
                except FileNotFoundError:
                    continue  # raced a concurrent delete — Hadoop skips too
        return out

    def list_files_recursive(self, p: str) -> list[tuple[str, int]]:
        """All (file_uri, size_bytes) under ``p``."""
        lp = self._lp(p)
        if lp is not None:
            return [(uri, st.st_size) for uri, st in self._walk_local(lp)]
        out: list[tuple[str, int]] = []
        if not self.exists(p):
            return out
        it = self._fs.listFiles(self._Path(p), True)
        while it.hasNext():
            st = it.next()
            out.append((st.getPath().toString(), st.getLen()))
        return out

    def path_size(self, p: str) -> int:
        """Size in bytes of a single file."""
        lp = self._lp(p)
        if lp is not None:
            return os.path.getsize(lp)
        return self._fs.getFileStatus(self._Path(p)).getLen()

    def mtime(self, p: str) -> float:
        """Modification time of a single file, epoch seconds."""
        lp = self._lp(p)
        if lp is not None:
            # truncate to ms like Hadoop's getModificationTime so
            # freshness comparisons see the same value either way
            return int(os.stat(lp).st_mtime * 1000) / 1000.0
        return self._fs.getFileStatus(self._Path(p)).getModificationTime() / 1000.0

    def list_files_mtime(self, p: str) -> list[tuple[str, int]]:
        """All (file_uri, modification_time_ms) under ``p`` — the
        DeltaStreamer DFS-source checkpoint basis (``DFSPathSelector``)."""
        lp = self._lp(p)
        if lp is not None:
            return [
                (uri, int(st.st_mtime * 1000)) for uri, st in self._walk_local(lp)
            ]
        out: list[tuple[str, int]] = []
        if not self.exists(p):
            return out
        it = self._fs.listFiles(self._Path(p), True)
        while it.hasNext():
            st = it.next()
            out.append((st.getPath().toString(), st.getModificationTime()))
        return out

    # -- small text files (timeline instants, configs) ---------------------
    def read_text(self, p: str) -> str:
        lp = self._lp(p)
        if lp is not None:
            # match the Hadoop branch's readLine+join rendering exactly:
            # line terminators normalized to \n, trailing newline dropped
            with open(lp, encoding="utf-8") as f:
                return "\n".join(f.read().splitlines())
        stream = self._fs.open(self._Path(p))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text(self, p: str, content: str) -> None:
        lp = self._lp(p)
        if lp is not None:
            # Hadoop's create() materializes missing parent dirs
            os.makedirs(os.path.dirname(lp) or "/", exist_ok=True)
            with open(lp, "w", encoding="utf-8") as f:
                f.write(content)
            return
        stream = self._fs.create(self._Path(p), True)
        try:
            stream.write(bytearray(content.encode("utf-8")))
        finally:
            stream.close()

    def create_exclusive(self, p: str, content: str) -> bool:
        """Atomic create-if-absent — a true CAS: returns True iff THIS
        call created ``p``, False if the file already exists (including
        losing a concurrent race to create it). Local paths use the
        OS-level ``O_CREAT|O_EXCL`` open (Hadoop's LocalFileSystem
        ``create(overwrite=false)`` is a non-atomic exists-then-create);
        other stores go through ``FileSystem.create(path, false)``, which
        is namenode-atomic on HDFS. The lock provider's acquisition path
        is built on this. Caller ensures the parent directory exists.

        Whether a path is "local" is decided by the RESOLVED Hadoop
        FileSystem scheme, never by the path string: a scheme-less path
        resolves through ``fs.defaultFS`` (exists/mtime/read already go
        there), so on a cluster with ``defaultFS=hdfs://`` treating it
        as a driver-local file would put the lock on a different store
        than every other lock operation — silently breaking OCC mutual
        exclusion."""
        import os as _os

        local_path = self._lp(p)
        if local_path is not None:
            try:
                fd = _os.open(
                    local_path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY, 0o644
                )
            except FileExistsError:
                return False
            # a failed CONTENT write must not leave the created (empty)
            # file behind: for a lock path that would be an ownerless
            # lock nobody can release until the TTL expires
            try:
                _os.write(fd, content.encode("utf-8"))
            except BaseException:
                _os.close(fd)
                try:
                    _os.unlink(local_path)
                except OSError:
                    pass
                raise
            _os.close(fd)
            return True
        try:
            stream = self._fs.create(self._Path(p), False)
        except Exception:
            if self.exists(p):
                return False
            raise
        try:
            stream.write(bytearray(content.encode("utf-8")))
            stream.close()
        except BaseException:
            try:
                stream.close()
            except Exception:
                pass
            self.delete(p)
            raise
        return True

    def write_text_atomic(self, p: str, content: str, overwrite: bool = False) -> None:
        """Write-then-rename. ``overwrite=False`` is the create-once
        timeline contract (rename fails if the target exists);
        ``overwrite=True`` replaces an existing file ATOMICALLY via
        ``FileContext`` rename-overwrite — the previous delete+rename
        had a crash window with NO file at the target, which for
        table_config.json would leave the whole table unloadable
        (code-review r4)."""
        # unique temp per call (code-review r7): two writers completing
        # the SAME path (rival compactors racing one instant's swap)
        # with a shared fixed temp name could interleave — the loser's
        # truncate-on-create tears the winner's bytes just before its
        # rename publishes them
        import uuid as _uuid

        tmp = f"{p}.tmp.{_uuid.uuid4().hex[:8]}"
        self.write_text(tmp, content)
        if overwrite:
            try:
                self.rename_overwrite(tmp, p)
            except Exception as e:
                self.delete(tmp)
                raise IOError(f"atomic overwrite failed: {p}") from e
            return
        if not self.rename_noreplace(tmp, p):
            self.delete(tmp)
            raise IOError(f"atomic rename failed (already exists?): {p}")


def is_not_found(exc: BaseException) -> bool:
    """True when ``exc`` means "the file does not exist" — Python's
    FileNotFoundError, or a py4j-wrapped Hadoop/Java
    FileNotFoundException (the form every ``FileSystem.open`` miss
    takes). Lock-less readers racing a consolidation/clean use this to
    distinguish a vanished-under-rival file from a real I/O failure."""
    if isinstance(exc, FileNotFoundError):
        return True
    java_exc = getattr(exc, "java_exception", None)
    if java_exc is not None:
        try:
            name = java_exc.getClass().getName()
        except Exception:
            return False
        return "FileNotFoundException" in name or "PathNotFound" in name
    return "FileNotFoundException" in str(exc)
