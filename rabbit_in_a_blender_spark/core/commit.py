"""Object-store-safe pointer-swap commits (VERDICT r11 task 2; I/O
ported to the Hadoop FileSystem API and guarded against concurrent
writers in r13 — VERDICT r12 tasks 1-2).

Every atomic overwrite in this repo historically relied on DIRECTORY-
RENAME atomicity (warehouse staged rename, ``compact_parquet_dir``'s
sibling swap).  That holds on local filesystems and HDFS but NOT on
S3-class object stores, where "rename" is a non-atomic copy+delete —
and even locally the two-rename swap has a window where the table path
does not exist (ADVICE r11: a concurrent reader gets ENOENT; a crash
inside the window strands the data under ``.__old__``).

This module provides the missing rung: a **manifest/pointer table**.

Layout::

    table_dir/
      _POINTER          # small text file: name of the live version dir
                        # (+ optional ``keep=N`` retention line)
      _COMMIT_LOCK      # present only while a commit is in flight
      v-000001/         # immutable parquet datasets, never mutated
      v-000002/

Commit protocol (:func:`pointer_commit`):

1. take the commit lock (exclusive create of ``_COMMIT_LOCK`` holding
   a per-commit token) — a second writer gets a clean
   :class:`ConcurrentCommitError` instead of the silent clobber the
   r12 verdict flagged (its sweep would have deleted the other
   writer's staged dir); a lock left by a CRASHED writer is broken
   after ``stale_lock_sec`` with a warning;
2. pick the next version number (max existing + 1 — crashed commits'
   orphan dirs are swept first, which is safe exactly because the
   lock proves no other writer has one in flight);
3. write the new data into its OWN fresh ``v-NNNNNN`` dir — no reader
   resolves it yet, so a crash here leaves only an orphan dir that the
   next commit garbage-collects;
4. re-check ownership (lock token unchanged, pointer unmoved) and
   publish by atomically replacing ``_POINTER`` — readers that resolve
   through the pointer see the OLD version or the NEW version, never a
   half-written directory and never ENOENT;
5. prune version dirs beyond the retention (never the live one) and
   release the lock.

Filesystem routing (VERDICT r12 task 1): a plain path (``/data/t``)
takes the local ``os`` fast path; any URI (``file://``, ``hdfs://``,
``s3a://``, ...) routes through the active Spark session's Hadoop
FileSystem — the same JVM connectors the DataFrame reader uses — so
``commit_mode=pointer`` actually executes on the object stores it was
built for.  The pointer publish there is a temp file + FileContext
rename-with-OVERWRITE (atomic on HDFS and every FS with an
AbstractFileSystem binding); schemes without one fall back to a direct
single-object overwrite PUT of ``_POINTER`` — on S3-class stores that
PUT is itself the atomic replace primitive.

Guarantees per commit mode (the docs VERDICT r11 task 2 asked for):

- ``rename`` (the default everywhere): all-or-nothing on POSIX/HDFS
  via directory rename; a crash between the two renames of the swap can
  leave the table path briefly absent (recoverable from ``.__old__``,
  see ``fsio.recover_parquet_dir``); NOT safe on object stores.
- ``pointer``: old-or-new at every instant, on any store with atomic
  single-object replace (POSIX rename, HDFS rename, S3 PUT); readers
  must resolve through :func:`resolve_pointer` / ``Warehouse.read``;
  version dirs double as snapshots (time travel = reading an older
  ``v-`` dir, restore = flipping the pointer back — zero data I/O).
  Concurrent writers: exactly one wins, the rest raise
  :class:`ConcurrentCommitError` with nothing ever-live deleted.

Retention (ADVICE r12 item 1): an explicit ``keep=`` is PERSISTED in
the pointer file, so a later plain ``write()``/``compact()`` (which
passes ``keep=None``) inherits the table's own retention instead of
silently pruning snapshots a ``write_versioned(keep=10)`` retained.

Residual caveat (documented, not fixed): breaking a stale lock assumes
the writer that took it is dead.  A writer PAUSED longer than
``stale_lock_sec`` mid-commit whose lock is broken can still be
writing into the version dir the new owner's sweep removes; the
zombie's own publish is refused (token re-check), so the live table is
never corrupted, but a snapshot dir could transiently hold its partial
files until retention prunes it.  Tune ``stale_lock_sec`` above any
plausible write_fn duration.

No reference equivalent (the reference's BigQuery backend gets this
from the warehouse service); parity target is the Delta/Iceberg
pointer-file discipline, re-expressed minimally.
"""

from __future__ import annotations

import os
import re
import time
import uuid
import warnings

POINTER = "_POINTER"
LOCK = "_COMMIT_LOCK"
PINS = "_PINS"
_VPREFIX = "v-"

#: Default retained versions when neither the call nor the table's
#: pointer file carries a ``keep=``.
DEFAULT_KEEP = 3

#: A ``_COMMIT_LOCK`` older than this (seconds) is presumed to belong
#: to a crashed writer and is broken with a warning.  Set well above
#: any plausible write_fn duration (see module docstring caveat).
DEFAULT_STALE_LOCK_SEC = 3600.0

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


class ConcurrentCommitError(RuntimeError):
    """Another writer holds (or took over) this table's commit lock.

    Raised INSTEAD of the silent clobber two unguarded writers used to
    produce (VERDICT r12 what's-missing #2: the loser's staged dir was
    swept, or both staged into the same version dir).  The losing
    commit leaves at most an orphan ``v-`` dir for the next commit's
    sweep; nothing that was ever live is touched.
    """


# ---------------------------------------------------------------------------
# filesystem adapters: local os fast path / Hadoop FileSystem for URIs
# ---------------------------------------------------------------------------


def _join(path: str, name: str) -> str:
    return path.rstrip("/") + "/" + name


class _LocalFS:
    """The ``os``-backed fast path every plain (scheme-less) table path
    takes — byte-for-byte the pre-r13 behavior, zero JVM round trips."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isfile(self, p: str) -> bool:
        return os.path.isfile(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        try:
            return os.listdir(p)
        except (FileNotFoundError, NotADirectoryError):
            return []

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def write_text_atomic(self, p: str, text: str) -> None:
        head, _, name = p.rpartition("/")
        tmp = _join(head, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def create_exclusive(self, p: str, text: str) -> bool:
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(text)
        return True

    def delete(self, p: str, recursive: bool = False) -> None:
        import shutil

        try:
            if recursive and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)
        except OSError:
            pass

    def mtime(self, p: str) -> float:
        return os.stat(p).st_mtime

    def listsizes(self, p: str) -> list[tuple[str, int]]:
        """(name, bytes) of the plain FILES directly under ``p``."""
        out = []
        try:
            with os.scandir(p) as it:
                for e in it:
                    if e.is_file():
                        out.append((e.name, e.stat().st_size))
        except (FileNotFoundError, NotADirectoryError):
            pass
        return out

    def walkfiles(self, p: str) -> list[tuple[str, int]]:
        """(full path, bytes) of every file under ``p``, recursive."""
        out = []
        for root, _dirs, files in os.walk(p):
            for f in files:
                fp = os.path.join(root, f)
                try:
                    out.append((fp, os.path.getsize(fp)))
                except OSError:
                    pass
        return out

    def listdirs(self, p: str) -> list[str]:
        """Names of the DIRECTORIES directly under ``p`` (one listing)."""
        out = []
        try:
            with os.scandir(p) as it:
                for e in it:
                    if e.is_dir():
                        out.append(e.name)
        except (FileNotFoundError, NotADirectoryError):
            pass
        return out


class _HadoopFS:
    """URI paths (``file://``, ``hdfs://``, ``s3a://``, ...) through
    the active Spark session's Hadoop FileSystem — the exact connector
    stack ``spark.read.parquet`` resolves the same URI with, so the
    pointer protocol executes wherever the data layer does (VERDICT
    r12 task 1: the previous ``os.*``-only implementation failed on
    every non-mounted store the mode was built for)."""

    def __init__(self, path: str):
        from pyspark.sql import SparkSession

        # getActiveSession is THREAD-local (None inside the ETL's table
        # worker threads); fall back to the process-wide session
        spark = (
            SparkSession.getActiveSession()
            or SparkSession._instantiatedSession
        )
        if spark is None:
            raise RuntimeError(
                f"pointer table {path!r} is a URI, which routes through "
                "the Spark session's Hadoop FileSystem — no SparkSession "
                "is active. Create the session first (local paths need "
                "none)."
            )
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._gw = sc._gateway
        self._conf = sc._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(self._conf)

    # -- helpers -----------------------------------------------------------
    def _p(self, p: str):
        return self._Path(p)

    @staticmethod
    def _is_java(e: Exception, *names: str) -> bool:
        s = str(e)
        return any(n in s for n in names)

    # -- interface ---------------------------------------------------------
    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._p(p)))

    def _status(self, p: str):
        from py4j.protocol import Py4JJavaError

        try:
            return self._fs.getFileStatus(self._p(p))
        except Py4JJavaError as e:
            if self._is_java(e, "FileNotFoundException"):
                return None
            raise

    def isfile(self, p: str) -> bool:
        st = self._status(p)
        return st is not None and bool(st.isFile())

    def isdir(self, p: str) -> bool:
        st = self._status(p)
        return st is not None and bool(st.isDirectory())

    def listdir(self, p: str) -> list[str]:
        from py4j.protocol import Py4JJavaError

        try:
            return [
                s.getPath().getName() for s in self._fs.listStatus(self._p(p))
            ]
        except Py4JJavaError as e:
            if self._is_java(e, "FileNotFoundException"):
                return []
            raise

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._p(p))

    def read_text(self, p: str) -> str:
        from py4j.protocol import Py4JJavaError

        try:
            stream = self._fs.open(self._p(p))
        except Py4JJavaError as e:
            if self._is_java(e, "FileNotFoundException"):
                raise FileNotFoundError(p) from e
            raise
        baos = self._jvm.java.io.ByteArrayOutputStream()
        # closes both streams
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
            stream, baos, self._conf, True
        )
        return baos.toString("UTF-8")

    def _write(self, p: str, text: str, overwrite: bool) -> None:
        out = self._fs.create(self._p(p), overwrite)
        out.write(bytearray(text.encode("utf-8")))
        out.close()

    def write_text_atomic(self, p: str, text: str) -> None:
        head, _, name = p.rpartition("/")
        tmp = _join(head, f".{name}.{uuid.uuid4().hex}.tmp")
        self._write(tmp, text, True)
        from py4j.protocol import Py4JJavaError

        try:
            # FileContext rename w/ OVERWRITE: the atomic single-object
            # replace on HDFS / local / every scheme with an
            # AbstractFileSystem binding
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._p(p).toUri(), self._conf
            )
            ren = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gw.new_array(ren, 1)
            opts[0] = ren.OVERWRITE
            fc.rename(self._p(tmp), self._p(p), opts)
        except Py4JJavaError as e:
            if not self._is_java(e, "UnsupportedFileSystemException"):
                self.delete(tmp)
                raise
            # no AbstractFileSystem binding (some object-store schemes):
            # a direct overwrite create is one PUT of a small object —
            # the store's own atomic replace primitive
            self._write(p, text, True)
            self.delete(tmp)

    def create_exclusive(self, p: str, text: str) -> bool:
        from py4j.protocol import Py4JJavaError

        try:
            out = self._fs.create(self._p(p), False)
        except Py4JJavaError as e:
            if self._is_java(e, "FileAlreadyExistsException"):
                return False
            raise
        out.write(bytearray(text.encode("utf-8")))
        out.close()
        return True

    def delete(self, p: str, recursive: bool = False) -> None:
        from py4j.protocol import Py4JJavaError

        try:
            self._fs.delete(self._p(p), bool(recursive))
        except Py4JJavaError:
            pass

    def mtime(self, p: str) -> float:
        st = self._status(p)
        if st is None:
            raise FileNotFoundError(p)
        return st.getModificationTime() / 1000.0

    def listsizes(self, p: str) -> list[tuple[str, int]]:
        """(name, bytes) of the plain FILES directly under ``p``."""
        from py4j.protocol import Py4JJavaError

        try:
            return [
                (s.getPath().getName(), int(s.getLen()))
                for s in self._fs.listStatus(self._p(p))
                if s.isFile()
            ]
        except Py4JJavaError as e:
            if self._is_java(e, "FileNotFoundException"):
                return []
            raise

    def walkfiles(self, p: str) -> list[tuple[str, int]]:
        """(full path, bytes) of every file under ``p``, recursive —
        ``FileSystem.listFiles(recursive=True)``, which on object
        stores is one flat LIST per page rather than a directory
        walk."""
        from py4j.protocol import Py4JJavaError

        out = []
        try:
            it = self._fs.listFiles(self._p(p), True)
            while it.hasNext():
                s = it.next()
                out.append((s.getPath().toString(), int(s.getLen())))
        except Py4JJavaError as e:
            if not self._is_java(e, "FileNotFoundException"):
                raise
        return out

    def listdirs(self, p: str) -> list[str]:
        """Names of the DIRECTORIES directly under ``p`` — ONE
        listStatus round trip (an isdir probe per entry would cost one
        RPC each on object stores)."""
        from py4j.protocol import Py4JJavaError

        try:
            return [
                s.getPath().getName()
                for s in self._fs.listStatus(self._p(p))
                if s.isDirectory()
            ]
        except Py4JJavaError as e:
            if self._is_java(e, "FileNotFoundException"):
                return []
            raise


def _fs_for(path: str):
    return _HadoopFS(path) if _URI_RE.match(path) else _LocalFS()


def is_uri(path: str) -> bool:
    """True iff ``path`` carries a URI scheme (and therefore routes
    through the session's Hadoop FileSystem rather than ``os``)."""
    return bool(_URI_RE.match(path))


#: Public alias: the filesystem adapter for a path — ``os``-backed for
#: plain paths, Hadoop-FileSystem-backed for URIs.  The pointer
#: protocol and the URI-rooted ``Warehouse`` share it.
fs_for = _fs_for


# ---------------------------------------------------------------------------
# pointer protocol
# ---------------------------------------------------------------------------


def is_pointer_table(path: str) -> bool:
    """True iff ``path`` is a pointer table (has a ``_POINTER`` file)."""
    return _fs_for(path).isfile(_join(path, POINTER))


def list_versions(path: str) -> list[int]:
    """All version numbers present on disk, ascending (live or not)."""
    out = []
    for name in _fs_for(path).listdir(path):
        if name.startswith(_VPREFIX) and name[len(_VPREFIX):].isdigit():
            out.append(int(name[len(_VPREFIX):]))
    return sorted(out)


def _vdir(path: str, version: int) -> str:
    return _join(path, f"{_VPREFIX}{version:06d}")


def _read_pointer(fs, path: str) -> tuple[int | None, int | None, int | None]:
    """(live version, persisted keep, high-water mark) from
    ``_POINTER``; (None, None, None) if the table has no pointer yet.

    The high-water mark (``max=N`` line) is the highest version ever
    PUBLISHED; it exceeds the live version only after a
    :func:`repoint` to an older version, where the versions between
    live and the mark are legit history, not crash orphans.  Absent
    (every pre-r13 pointer file), it equals the live version — which
    preserves the original sweep semantics exactly.

    One filesystem round trip (r14, guide §6): read-and-catch instead
    of the old isfile-probe-then-read pair — on an object store each
    probe is a network RPC, and the pointer is read three times per
    commit (entry, ownership re-check, release)."""
    p = _join(path, POINTER)
    try:
        text = fs.read_text(p)
    except (FileNotFoundError, IsADirectoryError):
        # missing or not-a-file == "no pointer yet"; anything else
        # (permissions, transport) must still raise, same as before
        return None, None, None
    lines = text.strip().splitlines()
    name = lines[0].strip() if lines else ""
    if not (name.startswith(_VPREFIX) and name[len(_VPREFIX):].isdigit()):
        raise ValueError(f"{p} holds {name!r}, not a version dir name")
    keep = None
    hw = None
    for ln in lines[1:]:
        ln = ln.strip()
        if ln.startswith("keep=") and ln[5:].lstrip("-").isdigit():
            keep = int(ln[5:])
        elif ln.startswith("max=") and ln[4:].isdigit():
            hw = int(ln[4:])
    live = int(name[len(_VPREFIX):])
    return live, keep, max(hw, live) if hw is not None else live


def current_version(path: str) -> int | None:
    """The live version number, or None if ``path`` isn't a pointer
    table yet."""
    return _read_pointer(_fs_for(path), path)[0]


def table_retention(path: str) -> int | None:
    """The ``keep=`` retention persisted in the pointer file, or None
    if the table has never been committed with an explicit keep."""
    return _read_pointer(_fs_for(path), path)[1]


def high_water(path: str) -> int | None:
    """The highest version ever published (>= live after a
    :func:`repoint`), or None if ``path`` isn't a pointer table yet."""
    return _read_pointer(_fs_for(path), path)[2]


def read_pins(path: str) -> set[int]:
    """Versions protected from retention pruning (``_PINS`` file) —
    the transaction layer pins every version a retained warehouse
    manifest still names (pipeline/txn.py), so a table-level commit
    can never prune a snapshot some consistent cross-table view
    resolves."""
    return _read_pins(_fs_for(path), path)


def _read_pins(fs, path: str) -> set[int]:
    """read_pins against an already-constructed fs adapter (one RPC:
    read-and-catch instead of isfile-then-read)."""
    p = _join(path, PINS)
    try:
        text = fs.read_text(p)
    except (FileNotFoundError, IsADirectoryError):
        return set()
    out = set()
    for ln in text.splitlines():
        ln = ln.strip()
        if ln.isdigit():
            out.add(int(ln))
    return out


def write_pins(path: str, versions: set[int] | list[int]) -> None:
    """Atomically replace the table's pinned-version set; an empty set
    removes the ``_PINS`` file.  A table dir that no longer exists
    (physically dropped while an older manifest still names it) is a
    no-op — there are no version dirs left to protect."""
    fs = _fs_for(path)
    p = _join(path, PINS)
    vs = sorted(set(int(v) for v in versions))
    if not vs:
        fs.delete(p)
        return
    if not fs.isdir(path):
        return
    fs.write_text_atomic(p, "\n".join(str(v) for v in vs))


def resolve_pointer(path: str) -> str:
    """The live data directory of a pointer table — the one path every
    reader must use.  Raises if the pointer is missing or dangling."""
    v = current_version(path)
    if v is None:
        raise FileNotFoundError(f"{path} has no {POINTER} file")
    d = _vdir(path, v)
    if not _fs_for(path).isdir(d):
        raise FileNotFoundError(f"{POINTER} names missing dir {d}")
    return d


def _publish(
    fs, path: str, version: int, keep: int | None, hw: int | None = None
) -> None:
    """Atomically point ``_POINTER`` at ``version`` (temp file + atomic
    single-object replace), persisting ``keep`` when given and the
    high-water mark when it exceeds the published version (repoint)."""
    text = f"{_VPREFIX}{version:06d}"
    if keep is not None:
        text += f"\nkeep={keep}"
    if hw is not None and hw > version:
        text += f"\nmax={hw}"
    fs.write_text_atomic(_join(path, POINTER), text)


def _acquire_lock(fs, path: str, token: str, stale_sec: float) -> None:
    lockp = _join(path, LOCK)
    for _ in range(3):
        if fs.create_exclusive(lockp, token):
            return
        try:
            age = time.time() - fs.mtime(lockp)
        except FileNotFoundError:
            continue  # released between probe and stat — retry
        if age > stale_sec:
            warnings.warn(
                f"breaking stale commit lock on {path} "
                f"(age {age:.0f}s > {stale_sec:.0f}s — presumed crashed "
                "writer; see core/commit.py docstring caveat)",
                RuntimeWarning,
                stacklevel=3,
            )
            fs.delete(lockp)
            continue
        raise ConcurrentCommitError(
            f"another commit is in flight on {path} ({LOCK} is "
            f"{age:.1f}s old); pointer tables are one-writer-at-a-time "
            "— retry after it finishes, or remove the lock if its "
            "writer crashed"
        )
    raise ConcurrentCommitError(
        f"could not acquire {LOCK} on {path} after retries"
    )


def _release_lock(fs, path: str, token: str) -> None:
    lockp = _join(path, LOCK)
    try:
        if fs.read_text(lockp).strip() == token:
            fs.delete(lockp)
    except (FileNotFoundError, OSError):
        pass


def pointer_commit(
    write_fn,
    path: str,
    keep: int | None = None,
    stale_lock_sec: float = DEFAULT_STALE_LOCK_SEC,
) -> int:
    """Run one pointer-swap commit: ``write_fn(data_dir)`` writes the
    new table contents into a fresh version dir, then the pointer flips.
    Returns the new version number.

    ``write_fn`` receives the version dir path and must leave a
    complete parquet dataset there (typically
    ``df.write.mode("overwrite").parquet(data_dir)``); it runs BEFORE
    any reader can resolve the dir, so it needs no atomicity of its
    own.

    ``keep`` bounds retained versions (the live one always survives;
    ``0`` disables pruning).  An EXPLICIT keep is persisted in the
    pointer file and inherited by later ``keep=None`` commits, so a
    plain ``Warehouse.write``/``compact`` never prunes snapshots a
    ``write_versioned(keep=10)`` retained (ADVICE r12 item 1); with no
    persisted retention, ``keep=None`` means :data:`DEFAULT_KEEP`.

    Concurrency: one writer per table, ENFORCED — a second concurrent
    commit raises :class:`ConcurrentCommitError` at lock acquisition
    (or, if it stole a stale lock, at the pre-publish ownership
    re-check), leaving at most an orphan dir for the next sweep and
    never touching a version that was ever live (VERDICT r12 task 2).
    """
    fs = _fs_for(path)
    fs.mkdirs(path)
    token = uuid.uuid4().hex
    _acquire_lock(fs, path, token, stale_lock_sec)
    try:
        live, persisted_keep, hw = _read_pointer(fs, path)
        persist_keep = keep if keep is not None else persisted_keep
        eff_keep = persist_keep if persist_keep is not None else DEFAULT_KEEP
        # ONE directory listing serves the orphan sweep, the temp-file
        # sweep, AND (below) the retention prune (r14, guide §6: a
        # listing is one RPC per page on an object store; this commit
        # previously listed the table dir three times).  Safe under the
        # lock — no other writer can add a staged dir meanwhile.
        names = fs.listdir(path)
        versions = sorted(
            int(n[len(_VPREFIX):])
            for n in names
            if n.startswith(_VPREFIX) and n[len(_VPREFIX):].isdigit()
        )
        # sweep garbage from crashed commits: version dirs never
        # published (numbered above the HIGH-WATER mark — after a
        # repoint, dirs between live and the mark are history, not
        # orphans) and stale temp pointer files
        base = max(hw or 0, live or 0)
        survivors = []
        for v in versions:
            if live is None or v > base:
                fs.delete(_vdir(path, v), recursive=True)
            else:
                survivors.append(v)
        for name in names:
            if name.startswith(f".{POINTER}.") and name.endswith(".tmp"):
                fs.delete(_join(path, name))
        new = base + 1 if live is not None else 1
        write_fn(_vdir(path, new))
        # conditional publish: if our lock was broken as stale (we were
        # presumed dead) or the pointer moved, abort rather than
        # publish over the new owner — the staged dir stays for sweep
        lockp = _join(path, LOCK)
        try:
            owner = fs.read_text(lockp).strip()
        except (FileNotFoundError, OSError):
            owner = None
        if owner != token:
            raise ConcurrentCommitError(
                f"commit lock on {path} was taken over mid-commit "
                "(presumed-stale break by another writer); aborting "
                "unpublished — the staged version dir will be swept"
            )
        if _read_pointer(fs, path)[0] != live:
            raise ConcurrentCommitError(
                f"pointer on {path} moved during the commit; aborting "
                "unpublished"
            )
        _publish(fs, path, new, persist_keep)
        if eff_keep > 0:
            pinned = _read_pins(fs, path)
            # on-disk versions now == pre-publish survivors + the new
            # one (this commit's own sweep + write are the only changes
            # under the lock) — no relisting needed
            for v in (survivors + [new])[:-eff_keep]:
                # never the new version, never the version that was
                # live a moment ago (after a repoint it can sit far
                # below the numeric tail), never a manifest-pinned one
                if v != new and v != live and v not in pinned:
                    fs.delete(_vdir(path, v), recursive=True)
        return new
    finally:
        _release_lock(fs, path, token)


def vacuum_table(
    path: str,
    keep: int | None = None,
    stale_lock_sec: float = DEFAULT_STALE_LOCK_SEC,
) -> tuple[int, int]:
    """Reclaim a pointer table's dead space WITHOUT committing:
    crash-orphan version dirs (numbered above the high-water mark),
    stale pointer temp files, and versions beyond the retention —
    sparing the live version and every ``_PINS``-pinned one, exactly
    like the commit-time prune.  Runs under the commit lock (a
    concurrent writer raises :class:`ConcurrentCommitError`).

    Returns ``(dirs_removed, bytes_reclaimed)``.  ``keep=None`` uses
    the table's persisted retention (or the default); ``keep=0``
    removes orphans/temps only.
    """
    fs = _fs_for(path)
    token = uuid.uuid4().hex
    _acquire_lock(fs, path, token, stale_lock_sec)
    try:
        live, persisted_keep, hw = _read_pointer(fs, path)
        if live is None:
            raise FileNotFoundError(f"{path} has no {POINTER} file")
        eff_keep = (
            keep if keep is not None
            else persisted_keep if persisted_keep is not None
            else DEFAULT_KEEP
        )
        base = max(hw or 0, live)
        # ONE listing serves the orphan scan, the retention scan, and
        # the temp sweep (r14, guide §6) — version-dir deletes below
        # cannot invalidate the temp-file subset of it
        names = fs.listdir(path)
        versions = sorted(
            int(n[len(_VPREFIX):])
            for n in names
            if n.startswith(_VPREFIX) and n[len(_VPREFIX):].isdigit()
        )
        victims = [v for v in versions if v > base]
        if eff_keep > 0:
            pinned = _read_pins(fs, path)
            victims += [
                v
                for v in versions[:-eff_keep]
                if v <= base and v != live and v not in pinned
            ]
        n_dirs, n_bytes = 0, 0
        for v in victims:
            d = _vdir(path, v)
            n_bytes += sum(size for _, size in fs.walkfiles(d))
            fs.delete(d, recursive=True)
            n_dirs += 1
        for name in names:
            if name.startswith(f".{POINTER}.") and name.endswith(".tmp"):
                fs.delete(_join(path, name))
        return n_dirs, n_bytes
    finally:
        _release_lock(fs, path, token)


def repoint(
    path: str,
    version: int,
    stale_lock_sec: float = DEFAULT_STALE_LOCK_SEC,
) -> int | None:
    """Atomically flip a pointer table back (or forward) to an existing
    version — ZERO data I/O, just the locked pointer replace.  Returns
    the previously live version.

    This is the restore/rollback primitive: the target version dir must
    already exist on disk.  The pointer's high-water mark keeps the
    versions ABOVE the new live one recognized as history (the next
    commit numbers past them instead of sweeping them as crash
    orphans), so a repoint is itself undoable by repointing forward
    again.  Retention: repoint never prunes; the next regular commit
    prunes by the persisted ``keep`` as usual (sparing pins and the
    just-replaced live version).
    """
    fs = _fs_for(path)
    token = uuid.uuid4().hex
    _acquire_lock(fs, path, token, stale_lock_sec)
    try:
        live, persisted_keep, hw = _read_pointer(fs, path)
        if live is None:
            raise FileNotFoundError(f"{path} has no {POINTER} file")
        if not fs.isdir(_vdir(path, version)):
            raise ValueError(
                f"{path} has no version {version}; available: "
                f"{list_versions(path)}"
            )
        _publish(
            fs, path, version, persisted_keep,
            hw=max(hw or 0, live, version),
        )
        return live
    finally:
        _release_lock(fs, path, token)
