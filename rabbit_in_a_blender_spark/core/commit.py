"""Object-store-safe pointer-swap commits (VERDICT r11 task 2).

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
      v-000001/         # immutable parquet datasets, never mutated
      v-000002/

Commit protocol (:func:`pointer_commit`):

1. pick the next version number (max existing + 1 — crashed commits'
   orphan dirs are swept first, so numbering never collides);
2. write the new data into its OWN fresh ``v-NNNNNN`` dir — no reader
   resolves it yet, so a crash here leaves only an orphan dir that the
   next commit garbage-collects;
3. publish by writing a temp pointer file (fsync'd) and ``os.replace``
   onto ``_POINTER`` — an ATOMIC single-file replace on POSIX, and the
   single-small-object PUT that object stores make atomic: readers that
   resolve through the pointer see the OLD version or the NEW version,
   never a half-written directory and never ENOENT;
4. prune version dirs beyond ``keep`` (never the live one).

Guarantees per commit mode (the docs VERDICT r11 task 2 asked for):

- ``rename`` (the default everywhere): all-or-nothing on POSIX/HDFS
  via directory rename; a crash between the two renames of the swap can
  leave the table path briefly absent (recoverable from ``.__old__``,
  see ``fsio.recover_parquet_dir``); NOT safe on object stores.
- ``pointer``: old-or-new at every instant, on any store with atomic
  single-object replace (POSIX rename, S3 PUT); readers must resolve
  through :func:`resolve_pointer` / ``Warehouse.read``; version dirs
  double as snapshots (time travel = reading an older ``v-`` dir,
  restore = flipping the pointer back — zero data I/O).  Single-writer
  per table, like the rename mode it replaces.

No reference equivalent (the reference's BigQuery backend gets this
from the warehouse service); parity target is the Delta/Iceberg
pointer-file discipline, re-expressed minimally.
"""

from __future__ import annotations

import os
import uuid

POINTER = "_POINTER"
_VPREFIX = "v-"


def is_pointer_table(path: str) -> bool:
    """True iff ``path`` is a pointer table (has a ``_POINTER`` file)."""
    return os.path.isfile(os.path.join(path, POINTER))


def list_versions(path: str) -> list[int]:
    """All version numbers present on disk, ascending (live or not)."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith(_VPREFIX) and name[len(_VPREFIX):].isdigit():
            out.append(int(name[len(_VPREFIX):]))
    return sorted(out)


def _vdir(path: str, version: int) -> str:
    return os.path.join(path, f"{_VPREFIX}{version:06d}")


def current_version(path: str) -> int | None:
    """The live version number, or None if ``path`` isn't a pointer
    table yet."""
    p = os.path.join(path, POINTER)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        name = f.read().strip()
    if not (name.startswith(_VPREFIX) and name[len(_VPREFIX):].isdigit()):
        raise ValueError(f"{p} holds {name!r}, not a version dir name")
    return int(name[len(_VPREFIX):])


def resolve_pointer(path: str) -> str:
    """The live data directory of a pointer table — the one path every
    reader must use.  Raises if the pointer is missing or dangling."""
    v = current_version(path)
    if v is None:
        raise FileNotFoundError(f"{path} has no {POINTER} file")
    d = _vdir(path, v)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"{POINTER} names missing dir {d}")
    return d


def _publish(path: str, version: int) -> None:
    """Atomically point ``_POINTER`` at ``version`` (fsync'd temp file +
    ``os.replace`` — the single-object atomic swap)."""
    tmp = os.path.join(path, f".{POINTER}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        f.write(f"{_VPREFIX}{version:06d}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, POINTER))


def pointer_commit(write_fn, path: str, keep: int = 3) -> int:
    """Run one pointer-swap commit: ``write_fn(data_dir)`` writes the
    new table contents into a fresh version dir, then the pointer flips.
    Returns the new version number.

    ``write_fn`` receives the version dir path and must leave a
    complete parquet dataset there (typically
    ``df.write.mode("overwrite").parquet(data_dir)``); it runs BEFORE
    any reader can resolve the dir, so it needs no atomicity of its
    own.  ``keep`` bounds retained versions (the live one always
    survives).  Single-writer per table.
    """
    import shutil

    os.makedirs(path, exist_ok=True)
    live = current_version(path)
    # sweep garbage from crashed commits: version dirs never published
    # (numbered above the live pointer) and stale temp pointer files
    for v in list_versions(path):
        if live is None or v > live:
            shutil.rmtree(_vdir(path, v), ignore_errors=True)
    for name in os.listdir(path):
        if name.startswith(f".{POINTER}.") and name.endswith(".tmp"):
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass
    new = (live or 0) + 1
    write_fn(_vdir(path, new))
    _publish(path, new)
    if keep > 0:
        for v in list_versions(path)[:-keep]:
            if v != new:
                shutil.rmtree(_vdir(path, v), ignore_errors=True)
    return new
