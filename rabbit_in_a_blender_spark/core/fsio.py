"""Filesystem-facing IO probes and sinks.

Split out of ``core/io.py`` (VERDICT r7 task 4): ``core.io`` sits in
the import closure of nearly every catalog query via ``load_tables``,
so a one-function change to a warehouse/streaming helper there flagged
~150 queries stale in the verification rotation.  Helpers that touch
the filesystem but NOT the testdata loaders live here; only the
streaming sinks and the CLI import this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parquet_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a readable parquet dataset — through the
    session's Hadoop FileSystem, so it answers correctly on HDFS/S3
    paths too (ADVICE r6: an ``os.path`` probe silently reports 'no
    index' for every non-local URI, which made the streaming corpus
    screen admit near-duplicates unchecked).  A present-but-empty
    directory counts as absent (schema inference would fail)."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException:
        return False


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """Atomic-rebuild sink: the reference's CREATE OR REPLACE TABLE ... AS
    (SURVEY §2 A7; bq:etl/{omop_table}_merge.sql.jinja:3-12) re-expressed.

    Parquet overwrite in Spark stages to _temporary and commits via rename,
    which is atomic per-directory on HDFS-like filesystems. For
    object-store deployments swap in Delta and ``mode("overwrite")`` on a
    table; the call-site contract (all-or-nothing replace) is identical.
    """
    df.write.mode("overwrite").parquet(path)


def _walk_parquet(p: str) -> list[str]:
    import os

    out = []
    for root, _dirs, files in os.walk(p):
        out += [
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
    return out


def _walk_parquet_sized(p: str) -> list[tuple[str, int]]:
    """(path, bytes) of the parquet data files under ``p`` — URI paths
    walk through the Hadoop FileSystem (r13), plain paths through
    ``os`` (kept separate so the local path stays monkeypatchable via
    :func:`_walk_parquet` in the quiesce tests and pays no JVM trip)."""
    import os

    from .commit import fs_for, is_uri

    if is_uri(p):
        out = []
        for f, size in fs_for(p).walkfiles(p):
            name = f.rsplit("/", 1)[-1]
            if name.endswith(".parquet") and not name.startswith((".", "_")):
                out.append((f, size))
        return out
    return [(f, os.path.getsize(f)) for f in _walk_parquet(p)]


def _rel_dir(f: str, base: str) -> str:
    """Directory of ``f`` relative to ``base`` ('.' when equal) —
    URI-safe: both sides reduce to their PATH component, so the JVM
    walker's ``file:/x`` form matches the caller's ``file:///x`` and
    plain paths pass through unchanged (urlparse leaves them as-is)."""
    import os
    from urllib.parse import urlparse

    return os.path.relpath(
        os.path.dirname(urlparse(f).path), urlparse(base).path
    )


def _discovered_partition_keys(data_dir: str, files: list[str]) -> list[str]:
    """The ``key=value`` partition-column sequence the files actually
    live under (what ``spark.read.parquet`` will discover).  Raises on
    MIXED layouts — files at different partition depths/keys would make
    the read itself fail with conflicting partition structures."""
    import os

    layouts = set()
    for f in files:
        rel = _rel_dir(f, data_dir)
        keys = tuple(
            seg.split("=", 1)[0]
            for seg in (rel.split(os.sep) if rel != "." else [])
            if "=" in seg
        )
        layouts.add(keys)
    if len(layouts) > 1:
        raise ValueError(
            f"{data_dir}: mixed partition layouts {sorted(layouts)} — "
            "refusing to compact (a single-layout rewrite would orphan "
            "or break part of the data; split or migrate the layouts "
            "first)"
        )
    return list(layouts.pop()) if layouts else []


def recover_parquet_dir(path: str) -> bool:
    """Crash recovery for the rename-mode swap: if ``path`` is absent
    but its ``.__old__`` sibling survives (a crash hit the window
    between the two renames), restore it.  Returns True if a restore
    happened.  ``compact_parquet_dir`` calls this automatically."""
    import os

    old = path.rstrip("/") + ".__old__"
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
        return True
    return False


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
    commit_mode: str = "rename",
) -> tuple[int, int]:
    """Rewrite an append-decayed parquet directory into ~``target_file_mb``
    files; returns (files_before, files_after).

    Every foreachBatch sink in streaming/sink.py appends per micro-batch
    — a week of 1-minute triggers decays a table into ~10k tiny files
    whose per-file open/footer cost dominates scans long before data
    size does (the classic small-files problem).  Compaction reads the
    dir once, repartitions to ceil(total_bytes / target_file_mb), and
    replaces the directory contents atomically per ``commit_mode``.

    Partition layout (ADVICE r11): the DISCOVERED ``key=value`` layout
    is preserved by default (``partition_by=None``), so a nested
    ``batch=*/centroid_id=*`` streaming index compacts to the same tree
    and later stream appends keep working.  An explicit ``partition_by``
    must match both the schema and the discovered layout — a typo'd or
    layout-changing key raises instead of silently rewriting to an
    unpartitioned (or conflicting) tree.

    Safety contract (ADVICE r11 — the target must be QUIESCED, and this
    function now enforces it rather than documenting it):

    - refuses a directory holding ``_spark_metadata`` (a file-sink's
      commit log would be left pointing at deleted files);
    - after the staging write, the source file listing is re-checked;
      if a concurrent writer appended or removed files mid-compaction
      the swap ABORTS (staging deleted, RuntimeError) instead of
      silently deleting the new files;
    - ``commit_mode="rename"`` (default): staged sibling + two renames;
      atomic old-or-new for readers EXCEPT a brief window where the
      path is absent; a crash in that window is auto-recovered on the
      next call (:func:`recover_parquet_dir`).  Local/HDFS only.
    - ``commit_mode="pointer"``: for pointer tables
      (``core/commit.py``) — the compacted data lands in a fresh
      version dir and one pointer file flips: old-or-new at EVERY
      instant, object-store safe, no absent-path window.  A plain
      directory is refused (raw ``spark.read.parquet(path)`` readers
      would break mid-conversion); write it via
      ``Warehouse(commit_mode="pointer")`` first.

    Data-neutral by construction: same rows, same schema (equality
    pytest-pinned).
    """
    import math
    import os
    import shutil

    from .commit import (
        fs_for,
        is_pointer_table,
        is_uri,
        pointer_commit,
        resolve_pointer,
    )

    if commit_mode not in ("rename", "pointer"):
        raise ValueError(
            f"commit_mode must be 'rename' or 'pointer', got {commit_mode!r}"
        )
    uri = is_uri(path)
    if uri and commit_mode != "pointer":
        raise ValueError(
            f"{path} is a URI: only commit_mode='pointer' compacts "
            "object-store paths (directory renames are not atomic "
            "there)"
        )
    if not uri:
        recover_parquet_dir(path)
    pointer = is_pointer_table(path)
    if commit_mode == "pointer" and not pointer:
        raise ValueError(
            f"{path} is not a pointer table; refusing to convert in "
            "place (readers using spark.read.parquet on the raw path "
            "would break). Write it with "
            "Warehouse(commit_mode='pointer') first."
        )
    data_dir = resolve_pointer(path) if pointer else path
    _isdir = fs_for(path).isdir if uri else os.path.isdir
    if _isdir(data_dir.rstrip("/") + "/_spark_metadata"):
        raise ValueError(
            f"{data_dir} has a _spark_metadata commit log (an active "
            "structured-streaming file sink); compacting would strand "
            "the log's file references. Stop the stream and remove the "
            "log, or compact a foreachBatch-owned table instead."
        )
    sized = sorted(_walk_parquet_sized(data_dir))
    before = [f for f, _ in sized]
    total_bytes = sum(size for _, size in sized)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    discovered = _discovered_partition_keys(data_dir, before)
    if partition_by is not None:
        missing = [k for k in partition_by if k not in discovered]
        if missing or list(partition_by) != discovered:
            raise ValueError(
                f"partition_by {list(partition_by)} does not match the "
                f"discovered partition layout {discovered} of {data_dir}"
                " — a mismatched rewrite would lose scan pruning or "
                "conflict with future appends. Omit partition_by to "
                "preserve the discovered layout."
            )
    keys = discovered
    df = spark.read.parquet(data_dir)

    def _write(dest: str) -> None:
        if keys:
            df.repartition(max(n_files, 1), *keys).write.mode(
                "overwrite"
            ).partitionBy(*keys).parquet(dest)
        else:
            df.repartition(n_files).write.mode("overwrite").parquet(dest)

    def _check_quiesced() -> None:
        now = (
            sorted(f for f, _ in _walk_parquet_sized(data_dir))
            if uri
            else sorted(_walk_parquet(data_dir))
        )
        if now != before:
            raise RuntimeError(
                f"{data_dir} changed during compaction "
                f"({len(before)} -> {len(now)} files): a concurrent "
                "writer is active; aborting the swap so its files are "
                "not deleted. Quiesce the table and re-run."
            )

    if pointer:
        def _write_checked(dest: str) -> None:
            _write(dest)
            _check_quiesced()

        pointer_commit(_write_checked, path)
        return len(before), len(_walk_parquet_sized(resolve_pointer(path)))

    staging = path.rstrip("/") + ".__staging__"
    shutil.rmtree(staging, ignore_errors=True)
    try:
        _write(staging)
        _check_quiesced()
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(before), len(_walk_parquet(path))
