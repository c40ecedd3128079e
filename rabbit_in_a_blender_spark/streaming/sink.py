"""Streaming → warehouse sink: foreachBatch micro-batch upsert.

The reference is batch-only; this is the extension that closes the loop —
a Structured Streaming query whose micro-batches MERGE into a warehouse
table (same upsert semantics as operators/joins.py::merge_upsert, J10).

Scale notes:
- foreachBatch gives exactly-once per micro-batch when paired with a
  checkpoint location: replayed batches re-merge idempotently because
  the upsert is keyed.
- each micro-batch merge reads the current table; for fact-sized targets
  swap the overwrite-reconcile for Delta MERGE (same call-site contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators.joins import merge_upsert
from ..pipeline.warehouse import Warehouse


def stream_upsert_query(
    stream_df: DataFrame,
    warehouse: Warehouse,
    zone: str,
    table: str,
    keys: Sequence[str],
    checkpoint_dir: str,
):
    """Build (not start) a writeStream that upserts each micro-batch.

    Returns the DataStreamWriter so callers pick the trigger
    (availableNow for backfill, processingTime for continuous).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.dropDuplicates(list(keys))
        if warehouse.exists(zone, table):
            target = warehouse.read(batch_df.sparkSession, zone, table)
            merged = merge_upsert(target, batch_df, list(keys))
        else:
            merged = batch_df
        warehouse.write(merged, zone, table)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_corpus_dedup(
    stream_docs: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
):
    """Build (not start) a writeStream that NEAR-dup-screens each
    micro-batch against the persistable LSH band index and grows both
    the corpus and the index — the streaming face of the CLI's
    incremental ``--corpus-dedup`` (continuous-crawl ingestion).

    Per micro-batch: ``incremental_dedup`` shingles and hashes ONLY the
    batch, probes the stored index with a band-key semi join (the
    corpus itself is never read), appends surviving docs to ``out_dir``
    and their band rows to ``index_dir``, then releases the loop's
    persisted intermediates — per-batch cost is O(batch), state lives
    entirely in the index table, not executor memory (contrast
    streaming_dedup_screen, whose exact-hash state store handles only
    byte-identical repeats within the watermark horizon).

    Replay semantics: docs append BEFORE bands, so a crash between the
    two writes re-appends the batch's docs on replay (duplicates to
    compact later) rather than silently dropping them (bands-first
    would make the replayed batch collide with its own bands).  For
    exactly-once swap both appends for Delta MERGE — the call-site
    contract is unchanged.

    Returns the DataStreamWriter; callers pick the trigger
    (availableNow for backfill, processingTime for continuous).
    """
    from ..core.fsio import parquet_exists
    from ..ext.dedup import incremental_dedup, unpersist_intermediates

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # Hadoop-FS-aware probe (ADVICE r6): os.path checks lie on
        # HDFS/S3 — the continuous-crawl deployment this sink targets —
        # and would silently skip the corpus screen every batch.
        have_index = parquet_exists(spark, index_dir)
        corpus_bands = spark.read.parquet(index_dir) if have_index else None
        clean, clean_bands = incremental_dedup(
            batch_df,
            corpus_bands,
            id_col,
            text_col,
            num_hashes=num_hashes,
            bands=bands,
            # micro-batch frames carry no input-file metadata; let the
            # delta fan-out decide from the batch's partition count
            fan_out_probe=True,
        )
        clean.write.mode("append").parquet(out_dir)
        clean_bands.write.mode("append").parquet(index_dir)
        unpersist_intermediates(clean, clean_bands)

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_dsir_select(
    stream_docs: DataFrame,
    out_dir: str,
    model_dir: str,
    checkpoint_dir: str,
    target_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 256,
    alpha: float = 1.0,
    seed: str = "dsir",
):
    """Build (not start) a writeStream that DSIR-scores each micro-batch
    at arrival — the streaming face of the CLI's incremental
    ``--dsir-select --dsir-model`` (continuous-crawl data selection).

    Per micro-batch: fold the batch's hashed-n-gram bucket counts into
    the persisted raw model (``model_dir``; first batch bootstraps it),
    score ONLY the batch against (frozen ``target_model``, updated raw
    model), and append ``(id, logw_micro)`` rows to ``out_dir``.  The
    raw model is <= num_buckets aggregate rows per batch, so state
    lives in a metadata-sized table, never executor memory; per-batch
    cost is one scan of the batch — historical text is never re-read.

    A batch's weights are exactly what :func:`ext.dsir.dsir_weights`
    over the full history-so-far (same frozen target) would assign —
    the incremental-equality contract, which is what makes the whole
    stream SQL-replayable batch by batch.

    Replay semantics (foreachBatch is at-least-once) — exactly-once on
    BOTH sides since r12 (ADVICE r11):

    - the model fold is IDEMPOTENT: each batch's aggregate lands as one
      file keyed by batch_id (ext.dsir.fold_model_increment), so a
      crash-replay can never double-count a batch in the raw model
      (ADVICE r10);
    - the score write is IDEMPOTENT: each batch's (id, logw_micro)
      rows OVERWRITE the batch's own ``out_dir/batch=<id>`` partition
      subdir (the overwrite_ivfpq_batch discipline), so a replay
      replaces rather than duplicates;
    - and replayed VALUES are deterministic: the batch scores against
      the model PREFIX view — fold files of its own batch id AND any
      later id are excluded (after a checkpoint rollback every batch
      from the rollback point re-fires, so "later" folds may already
      exist on disk) — so a crash AFTER the fold but before checkpoint
      commit recomputes exactly the weights the original run produced
      (previously the replay re-folded the batch in-plan and emitted
      divergent scores).  One caveat: ext.dsir.compact_model merges
      fold files into the base — run it only on a quiesced stream (its
      own documented contract), otherwise a replay straddling a
      compaction cannot reconstruct the prefix view.

    Readers use ``spark.read.parquet(out_dir)`` — partition discovery
    surfaces an extra ``batch`` column alongside (id, logw_micro).
    Local-path model listing, like fold_model_increment itself.

    Returns the DataStreamWriter; callers pick the trigger.
    """
    from ..core.caching import unpersist_intermediates
    from ..ext.dsir import (
        fold_model_increment,
        hashed_ngram_buckets,
        incremental_dsir_weights,
    )

    # Collapse the frozen target ONCE at stream construction (r13
    # optimization round): it is a <= num_buckets-row aggregate, but a
    # caller typically hands it over as the LAZY dsir_model_counts
    # lineage — a full target-corpus featurize that fit_bucket_logratio
    # would otherwise re-execute inside EVERY micro-batch.  One
    # execution total instead of one per batch: noise-level at bench
    # scale (the fixture's target corpus is sub-MB) but unbounded on a
    # long-running stream over a real corpus.  Since r14 the collapsed
    # form is a plain DRIVER-side dict (incremental_dsir_weights takes
    # dict models): no per-batch scan of a 32-slice local relation —
    # one of the four profiled |cores|-task zero-I/O jobs every batch
    # paid at local[32] (guide §5).  Exact integer counts either way.
    target_counts: dict[int, int] = {}
    for r in target_model.select("bucket", "cnt").collect():
        target_counts[int(r["bucket"])] = (
            target_counts.get(int(r["bucket"]), 0) + int(r["cnt"])
        )
    # Fold files are immutable once written (atomic tmp+rename, see
    # fold_model_increment), so their CONTENTS are cached across
    # micro-batches keyed by filename — only files newly appeared since
    # the last batch are read, instead of re-reading the whole fold
    # history per batch, O(B²) over the stream (VERDICT r13 task 1).
    # The per-batch PREFIX view is still decided per batch from the
    # directory listing, so replay semantics are unchanged; ≤
    # num_buckets ints per entry, and compact_model's documented
    # quiesced-stream contract means entries never go stale mid-run.
    fold_cache: dict[str, list[tuple[int, int]]] = {}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        import os

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        tag = f"batch-{batch_id:08d}"

        def _is_future_fold(name: str) -> bool:
            # a replayed batch must see the model PREFIX folded by
            # strictly-earlier batches: zero-padded batch tags compare
            # lexicographically, so its own fold AND any later batch's
            # fold (all of which re-fire after a checkpoint rollback)
            # are excluded from the scoring view
            return (
                name.startswith("inc-batch-")
                and name.endswith(".parquet")
                and name >= f"inc-{tag}.parquet"
            )

        model_files = (
            sorted(
                os.path.join(model_dir, f)
                for f in os.listdir(model_dir)
                if f.endswith(".parquet") and not _is_future_fold(f)
            )
            if os.path.isdir(model_dir)
            else []
        )
        # Driver-side pyarrow read of the fold files (r13 optimization
        # round, guide §5): the model is ≤ num_buckets aggregate rows
        # per file by contract, but a per-batch spark.read.parquet paid
        # schema-inference and scan jobs just to re-read metadata.  The
        # summed dict feeds incremental_dsir_weights' driver-side model
        # algebra with zero scheduled jobs; file contents come from the
        # cross-batch cache above, so each fold file is read ONCE per
        # stream, not once per batch.
        raw_counts: dict[int, int] = {}
        for f in model_files:
            if f not in fold_cache:
                t = pq.read_table(f, columns=["bucket", "cnt"])
                fold_cache[f] = list(
                    zip(
                        t.column("bucket").to_pylist(),
                        t.column("cnt").to_pylist(),
                    )
                )
            for b, c in fold_cache[f]:
                raw_counts[int(b)] = raw_counts.get(int(b), 0) + int(c)
        # Featurize the batch ONCE (r13 optimization round): the score
        # pass and the model fold both read the same persisted
        # (id, bucket, cnt) frame — previously the fold re-ran the full
        # hashed-n-gram explode via dsir_model_counts, doubling the
        # per-batch corpus-sized work.  Its (bucket, cnt) aggregate is
        # collected ONCE (the only per-batch model job) and shared by
        # the scoring pass and the fold.
        doc_buckets = hashed_ngram_buckets(
            batch_df, id_col, text_col, num_buckets, seed,
            # micro-batch frames carry no input-file metadata; let the
            # featurize fan-out decide from the batch's partition count
            # + plan-stats size (core.parallelism)
            fan_out_probe=True,
        ).persist()
        batch_rows = (
            doc_buckets.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
        )
        batch_counts = {int(r["bucket"]): int(r["cnt"]) for r in batch_rows}
        weights, _updated = incremental_dsir_weights(
            batch_df, raw_counts, target_counts, id_col, text_col,
            num_buckets=num_buckets, alpha=alpha, seed=seed,
            doc_buckets=doc_buckets, batch_model=batch_counts,
        )
        weights.write.mode("overwrite").parquet(
            f"{out_dir.rstrip('/')}/batch={int(batch_id)}"
        )
        fold_model_increment(
            spark, model_dir, None, tag=tag, rows=batch_rows
        )
        unpersist_intermediates(weights)
        doc_buckets.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_semantic_dedup(
    stream_vecs: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.35,
    grid: int = 6,
    max_cluster_size: int | None = None,
    assign_method: str = "auto",
    coarse_probe: int = 4,
):
    """Build (not start) a writeStream that SemDeDup-screens each
    embedding micro-batch against a persisted kept-exemplar index — the
    streaming face of ``ext/semdedup.py::incremental_semantic_dedup``,
    completing the continuous-crawl matrix (surface-form LSH dedup,
    DSIR, IVFADC, and now semantic dedup all have batch + incremental +
    streaming forms).

    ``centroids`` must be the FROZEN centroid frame the whole stream
    screens under (re-cluster offline and rebuild when drift warrants —
    measured by ext/drift.py, not guessed).  Per micro-batch: assign +
    screen ONLY the batch (cluster-local probe of the stored exemplars
    + the intra-batch min-id rule), write its (id, centroid_id, is_dup)
    flags to ``out_dir/batch=<id>`` and its surviving exemplar rows to
    ``index_dir/batch=<id>`` — O(batch x cluster density), history
    vectors never re-read, state lives in the index table.

    Replay semantics (exactly-once BY VALUE, the r12 DSIR-sink
    discipline): both writes OVERWRITE the batch's own ``batch=<id>``
    subdir, and the screen reads only index subdirs of STRICTLY EARLIER
    batch ids — so a replayed batch sees exactly the prefix the
    original run saw (never its own or later batches' exemplars, which
    would flag every replayed row as a dup of itself) and reproduces
    byte-identical flags.  Searches/screens over the full index use
    ``spark.read.parquet(index_dir)`` (partition discovery adds a
    ``batch`` column).  Local-path subdir listing, like the DSIR sink.

    Returns the DataStreamWriter; callers pick the trigger.
    """
    from ..core.caching import unpersist_intermediates
    from ..ext.semdedup import incremental_semantic_dedup

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        import os

        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        prefix_dirs = []
        if os.path.isdir(index_dir):
            for d in os.listdir(index_dir):
                tail = d.split("=", 1)
                if (
                    d.startswith("batch=")
                    and len(tail) == 2
                    and tail[1].isdigit()
                    and int(tail[1]) < int(batch_id)
                ):
                    prefix_dirs.append(os.path.join(index_dir, d))
        index = (
            spark.read.parquet(*sorted(prefix_dirs)) if prefix_dirs else None
        )
        flags, kept = incremental_semantic_dedup(
            batch_df, index, centroids,
            id_col=id_col, vec_col=vec_col, tau=tau, grid=grid,
            max_cluster_size=max_cluster_size,
            assign_method=assign_method, coarse_probe=coarse_probe,
        )
        flags.write.mode("overwrite").parquet(
            f"{out_dir.rstrip('/')}/batch={int(batch_id)}"
        )
        kept.write.mode("overwrite").parquet(
            f"{index_dir.rstrip('/')}/batch={int(batch_id)}"
        )
        unpersist_intermediates(flags, kept)

    return (
        stream_vecs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_ivfpq_append(
    stream_vecs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    books: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    residual: bool = False,
):
    """Build (not start) a writeStream that grows a persisted IVFADC
    index as embedding batches arrive — the streaming face of
    ``ext/ivfpq.py::append_ivfpq_index`` (continuous-crawl ANN,
    VERDICT r10 task 5's streaming twin).

    Per micro-batch: encode ONLY the batch against the FROZEN coarse
    centroids + PQ codebooks (zero-shuffle fused assignment+encode) and
    overwrite the batch's own ``batch=<id>`` partition subdir
    (:func:`ext.ivfpq.overwrite_ivfpq_batch`).  Because every batch
    owns its subdir, foreachBatch's at-least-once replay REPLACES
    rather than duplicates — exactly-once index contents with no
    ledger, no Delta dependency.  Per-batch cost is O(batch); history
    is never read.  Searches over ``spark.read.parquet(index_dir)``
    prune on centroid_id exactly as over a single-build layout.

    Returns the DataStreamWriter; callers pick the trigger.
    """
    from ..ext.ivfpq import overwrite_ivfpq_batch

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_ivfpq_batch(
            batch_df, centroids, books, index_dir, batch_id,
            id_col=id_col, vec_col=vec_col, m=m, residual=residual,
        )

    return (
        stream_vecs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
