"""Streaming-window extension queries (SURVEY §2.M), batch-checkable.

The same window specs run under Structured Streaming via
``rabbit_in_a_blender_spark.streaming`` (readStream + watermark); here
they run in batch so the DuckDB oracle can verify the window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..streaming.tuning import pinned_shuffle_partitions
from ..streaming.windows import session_agg, sliding_agg, tumbling_agg
from .catalog import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_tumbling_1h",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3)     AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return tumbling_agg(e, "ts", "1 hour", ["event_type"])


@register(
    "stream_sliding_1h_30m",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT e.event_type,
             make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - o.off) * 1000000 AS BIGINT)) AS ws
      FROM events e CROSS JOIN (VALUES (0), (1800)) o(off)
    )
    GROUP BY ws, event_type
    """,
)
def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return sliding_agg(e, "ts", "1 hour", "30 minutes", ["event_type"])


@register(
    "stream_session_30m",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3)     AS total_value
    FROM sessions GROUP BY user_id, sess_id
    """,
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return session_agg(e, "ts", "30 minutes", ["user_id"])


@register(
    "stream_corpus_dedup_batch",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
               i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' ')
             ))) AS shingle
      FROM documents
    ),
    hashes AS (
      SELECT doc_id, j, MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS j) js
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, j // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY j)) AS band_hash
      FROM hashes GROUP BY doc_id, j // 4
    ),
    a_bands AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    b_bands AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    a_losers AS (
      SELECT DISTINCT y.doc_id FROM a_bands x
      JOIN a_bands y ON x.band_idx = y.band_idx
       AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
    ),
    sa AS (
      SELECT doc_id FROM documents WHERE doc_id % 2 = 0
        AND doc_id NOT IN (SELECT doc_id FROM a_losers)
    ),
    index_bands AS (SELECT b.* FROM bands b JOIN sa USING (doc_id)),
    b_corpus_hits AS (
      SELECT DISTINCT b.doc_id FROM b_bands b
      JOIN index_bands c ON b.band_idx = c.band_idx
       AND b.band_hash = c.band_hash
    ),
    b_losers AS (
      SELECT DISTINCT y.doc_id FROM b_bands x
      JOIN b_bands y ON x.band_idx = y.band_idx
       AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
    )
    SELECT doc_id, lang FROM documents
    WHERE (doc_id % 2 = 0
           AND doc_id NOT IN (SELECT doc_id FROM a_losers))
       OR (doc_id % 2 = 1
           AND doc_id NOT IN (SELECT doc_id FROM b_corpus_hits)
           AND doc_id NOT IN (SELECT doc_id FROM b_losers))
    """,
    doc="The streaming corpus screen (streaming/sink.py) under the hash "
    "gate: documents split into two single-file micro-batches "
    "(doc_id parity; availableNow + maxFilesPerTrigger=1), batch 1 "
    "bootstraps the LSH band index, batch 2 is screened against batch "
    "1's SURVIVORS and itself.  The oracle replays the exact band "
    "arithmetic and batch sequencing; the Spark side runs the real "
    "foreachBatch sink with checkpointing.",
)
def stream_corpus_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from ..streaming.sink import stream_corpus_dedup

    d = load_tables(spark, sf_dir, "documents")["documents"]
    root = tempfile.mkdtemp(prefix="riab_scd_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    # two deterministic single-file micro-batches, mtime-ordered (the
    # file source processes oldest first with maxFilesPerTrigger=1)
    for i, half in enumerate(
        (d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1))
    ):
        tmp = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    out_dir = os.path.join(root, "out")
    query = (
        stream_corpus_dedup(
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir),
            out_dir=out_dir,
            index_dir=os.path.join(root, "index"),
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir).select("doc_id", "lang")


@register(
    "stream_counts_batch",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3)     AS total_value
    FROM events GROUP BY user_id
    """,
    doc="The cumulative stateful counter (streaming/stateful.py "
    "running_counts, applyInPandasWithState + update mode) under the "
    "hash gate: events replay as two micro-batches; the FINAL state per "
    "user (largest cumulative row in the update stream) must equal the "
    "batch groupBy — count exact, sum on the shared ROUND(,3) "
    "convention.",
)
def stream_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.stateful import running_counts

    e = load_tables(spark, sf_dir, "events")["events"].select(
        "user_id", "ts", "value"
    )
    root = tempfile.mkdtemp(prefix="riab_scnt_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    for i, half in enumerate(
        (e.filter(F.col("user_id") % 2 == 0), e.filter(F.col("user_id") % 2 == 1))
    ):
        tmp = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    name = f"riab_scnt_{uuid.uuid4().hex[:8]}"
    query = (
        running_counts(
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps scheduling timeout-processing batches,
    # so availableNow never self-terminates — poll until the cumulative
    # counts account for every input row, then stop the query.
    import time

    total = e.count()
    deadline = time.time() + 240
    seen = -1
    while time.time() < deadline:
        seen = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("__n"))
            .agg(F.sum("__n"))
            .first()[0]
        )
        if seen == total:
            break
        time.sleep(2)
    query.stop()
    if seen != total:
        # A slow environment must fail as a TIMEOUT, not surface later as
        # an oracle hash mismatch on a partial snapshot (ADVICE r8).
        raise TimeoutError(
            f"stream_counts_batch: stream drained {seen}/{total} rows "
            "within the 240s deadline — environment too slow, not a "
            "stateful-operator bug"
        )
    # update mode appends one cumulative row per (user, micro-batch);
    # the final state is the max-count row per user
    mem = spark.table(name)
    return (
        mem.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("__s"))
        .select(
            "user_id",
            F.col("__s.n_events").alias("n_events"),
            F.col("__s.total_value").alias("total_value"),
        )
    )


@register(
    "stream_zscore_batch",
    oracle="""
    WITH roll AS (
      SELECT event_type,
             make_timestamp(CAST(floor(epoch(ts)/21600)*21600 AS BIGINT)*1000000)
               AS bucket,
             (SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_v
      FROM events GROUP BY 1, 2
    ),
    mx AS (
      SELECT event_type, MAX(bucket) AS mb FROM roll GROUP BY event_type
    ),
    scored AS (
      SELECT event_type, bucket, avg_v,
             FLOOR(avg_v * 10000) / 10000.0 AS avg4,
             COUNT(avg_v) OVER w AS n_prev,
             AVG(avg_v) OVER w AS mu,
             stddev_pop(avg_v) OVER w AS sigma
      FROM roll
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
    )
    SELECT s.event_type,
           strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           avg4 AS avg_value,
           ROUND((avg_v - mu) / sigma, 3) AS zscore,
           abs(ROUND((avg_v - mu) / sigma, 3)) > 2 AS is_anomaly
    FROM scored s JOIN mx USING (event_type)
    WHERE n_prev >= 4 AND sigma > 0 AND s.bucket < mx.mb
    """,
    doc="The stateful streaming z-score (streaming/stateful.py "
    "stream_zscore) under the hash gate: events replay as two "
    "time-ordered single-file micro-batches (split at the midpoint "
    "timestamp, so nothing arrives late) through the real "
    "applyInPandasWithState operator with a parquet sink.  Closed "
    "buckets must match the batch rolling_zscore bit-for-bit — the "
    "oracle is the ext_ts_rolling_zscore oracle minus each group's "
    "newest bucket, which never closes in a finite replay.",
)
def stream_zscore_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from ..streaming.stateful import stream_zscore

    e = load_tables(spark, sf_dir, "events")["events"].select(
        "event_type", "ts", "value"
    )
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    root = tempfile.mkdtemp(prefix="riab_szs_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    for i, half in enumerate(
        (e.filter(F.col("ts") <= F.lit(mid)), e.filter(F.col("ts") > F.lit(mid)))
    ):
        tmp = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    out_dir = os.path.join(root, "out")
    # event_type is an enum-like key (5 values at every SF), so the
    # state exchange gets 8 partitions instead of the 32-partition
    # batch default — see streaming/tuning.py for why state partitions
    # beyond the group cardinality are pure per-batch overhead.
    with pinned_shuffle_partitions(spark, 8):
        query = (
            stream_zscore(
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(in_dir),
                "event_type",
                width_s=21600,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    return spark.read.parquet(out_dir).withColumnRenamed("group_key", "event_type")


@register(
    "stream_drift_batch",
    oracle="""
    WITH base AS (
      SELECT source AS s, CAST(n_chars AS DOUBLE) AS v FROM documents
    ),
    edges AS (
      SELECT quantile_cont(v, [0.25, 0.5, 0.75]) AS e FROM base WHERE s = 'src0'
    ),
    binned AS (
      SELECT s, len(list_filter((SELECT e FROM edges), x -> v >= x)) AS bin,
             COUNT(*) AS c
      FROM base GROUP BY 1, 2
    ),
    grid AS (
      SELECT DISTINCT base.s, b.bin
      FROM base, (SELECT UNNEST(range(4)) AS bin) b
    ),
    cells AS (
      SELECT g.s, g.bin, COALESCE(binned.c, 0) AS c
      FROM grid g LEFT JOIN binned ON g.s = binned.s AND g.bin = binned.bin
    ),
    shares AS (
      SELECT s, bin, c,
             (c + 0.5) / (SUM(c) OVER (PARTITION BY s) + 2.0) AS p
      FROM cells
    ),
    ref AS (SELECT bin, p AS pr FROM shares WHERE s = 'src0')
    SELECT s AS stratum, CAST(SUM(c) AS BIGINT) AS n_docs,
           ROUND(SUM((p - pr) * ln(p / pr)), 4) AS psi
    FROM shares JOIN ref USING (bin) WHERE s <> 'src0' GROUP BY s
    """,
    doc="The streaming drift monitor (streaming/monitor.py) under the "
    "hash gate: the reference profile is fit on src0, the remaining "
    "strata stream in as two single-file micro-batches (doc_id parity; "
    "availableNow + maxFilesPerTrigger=1), and the monitor's CUMULATIVE "
    "report after the replay must equal the batch psi_drift over the "
    "whole table — which is exactly the ext_psi_drift oracle.",
)
def stream_drift_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from ..ext.drift import fit_reference_profile
    from ..streaming.monitor import stream_drift_monitor

    d = load_tables(spark, sf_dir, "documents")["documents"]
    ref = d.filter(F.col("source") == "src0")
    cand = d.filter(F.col("source") != "src0")
    edges, shares = fit_reference_profile(ref, "n_chars", n_bins=4)
    root = tempfile.mkdtemp(prefix="riab_sdrift_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    for i, half in enumerate(
        (cand.filter(F.col("doc_id") % 2 == 0), cand.filter(F.col("doc_id") % 2 == 1))
    ):
        tmp = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    report_dir = os.path.join(root, "report")
    query = (
        stream_drift_monitor(
            spark.readStream.schema(cand.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir),
            "source",
            "n_chars",
            edges,
            shares,
            counts_dir=os.path.join(root, "counts"),
            report_dir=report_dir,
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(report_dir).select("stratum", "n_docs", "psi")


@register(
    "stream_heavy_hitters_batch",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM toks GROUP BY token
    HAVING COUNT(*) * 30 > (SELECT COUNT(*) FROM toks)
    """,
    doc="The streaming Misra-Gries tracker (streaming/stateful.py "
    "stream_heavy_hitters, applyInPandasWithState + update mode) under "
    "the hash gate: document tokens replay as two micro-batches routed "
    "to 8 sharded MG(30) sketches; the final candidate snapshot is a "
    "guaranteed superset of tokens with frequency > n/30, so the exact "
    "batch-side re-count + threshold filter equals the plain HAVING "
    "oracle — the same answer as ext_heavy_hitters, with the screen "
    "pass streamed instead of scanned.",
)
def stream_heavy_hitters_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile
    import time
    import uuid

    from ..streaming.stateful import stream_heavy_hitters

    k = 30
    d = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text"
    )
    root = tempfile.mkdtemp(prefix="riab_shh_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    for i, half in enumerate(
        (d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1))
    ):
        tmp = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    name = f"riab_shh_{uuid.uuid4().hex[:8]}"
    stream_toks = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    # the stream routes to exactly 8 MG shards, so 8 state partitions
    # (vs the 32-partition batch default) carry the same parallelism
    # with a quarter of the per-batch state-store overhead — see
    # streaming/tuning.py.
    with pinned_shuffle_partitions(spark, 8):
        query = (
            stream_heavy_hitters(stream_toks, "token", k=k, shards=8)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        batch_toks = d.select(F.explode(F.split("text", " ")).alias("token"))
        total = batch_toks.count()
        # availableNow terminates once every pending file is processed,
        # and the memory sink is populated synchronously per micro-batch
        # — so ONE post-termination drain check replaces the former
        # 2 s-granular poll loop (r13 optimization round: the poll
        # averaged ~2-3 s of pure sleep inside the timed query).  The
        # deadline guard stays for the pathological-environment
        # diagnosis.  awaitTermination stays inside the pin so the conf
        # is live until every micro-batch has been planned.
        deadline = time.time() + 240
        query.awaitTermination(240)
    seen = (
        spark.table(name)
        .groupBy("shard")
        .agg(F.max("n_seen").alias("__n"))
        .agg(F.sum("__n"))
        .first()[0]
    )
    while seen != total and time.time() < deadline:
        time.sleep(1)
        seen = (
            spark.table(name)
            .groupBy("shard")
            .agg(F.max("n_seen").alias("__n"))
            .agg(F.sum("__n"))
            .first()[0]
        )
    query.stop()
    if seen != total:
        raise TimeoutError(
            f"stream_heavy_hitters_batch: sketches drained {seen}/{total} "
            "tokens within the 240s deadline — environment too slow, not "
            "a stateful-operator bug"
        )
    from pyspark.sql.window import Window

    mem = spark.table(name)
    # final sketch = the max-n_seen snapshot per shard (update mode
    # appends one snapshot per shard per micro-batch); window-max
    # instead of a self-join (memory-sink self-joins trip reference
    # resolution) — the sink holds sketch rows, metadata-sized
    snap = mem.withColumn(
        "__mx", F.max("n_seen").over(Window.partitionBy("shard"))
    ).where(F.col("n_seen") == F.col("__mx"))
    cand = (
        snap.where(F.col("item").isNotNull())
        .select(F.col("item").alias("token"))
        .distinct()
    )
    exact = (
        batch_toks.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * k > F.lit(int(total)))
    )
    return exact


@register(
    "stream_dsir_batch",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, lang, g
      FROM toks, unnest(list_concat(
          w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      )) AS u(g)
    ),
    bucketed AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT) % 64 AS bucket
      FROM grams
    ),
    doc_counts AS (
      SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bucketed GROUP BY 1, 2, 3
    ),
    tgt AS (SELECT bucket, SUM(cnt) AS tc FROM doc_counts
            WHERE lang = 'en' GROUP BY 1),
    tt AS (SELECT SUM(tc) AS ttot FROM tgt),
    raw1 AS (SELECT bucket, SUM(cnt) AS rc FROM doc_counts
             WHERE doc_id % 2 = 0 GROUP BY 1),
    rt1 AS (SELECT SUM(rc) AS rtot FROM raw1),
    ratios1 AS (
      SELECT COALESCE(r.bucket, t.bucket) AS bucket,
             CAST(ROUND((ln((COALESCE(tc, 0) + 1.0) / (ttot + 1.0 * 64))
                       - ln((COALESCE(rc, 0) + 1.0) / (rtot + 1.0 * 64)))
                  * 1e6) AS BIGINT) AS ratio_micro
      FROM raw1 r FULL JOIN tgt t USING (bucket), rt1, tt
    ),
    raw2 AS (SELECT bucket, SUM(cnt) AS rc FROM doc_counts GROUP BY 1),
    rt2 AS (SELECT SUM(rc) AS rtot FROM raw2),
    ratios2 AS (
      SELECT COALESCE(r.bucket, t.bucket) AS bucket,
             CAST(ROUND((ln((COALESCE(tc, 0) + 1.0) / (ttot + 1.0 * 64))
                       - ln((COALESCE(rc, 0) + 1.0) / (rtot + 1.0 * 64)))
                  * 1e6) AS BIGINT) AS ratio_micro
      FROM raw2 r FULL JOIN tgt t USING (bucket), rt2, tt
    )
    SELECT doc_id, CAST(SUM(cnt * ratio_micro) AS BIGINT) AS logw_micro
    FROM doc_counts JOIN ratios1 USING (bucket)
    WHERE doc_id % 2 = 0 GROUP BY doc_id
    UNION ALL
    SELECT doc_id, CAST(SUM(cnt * ratio_micro) AS BIGINT) AS logw_micro
    FROM doc_counts JOIN ratios2 USING (bucket)
    WHERE doc_id % 2 = 1 GROUP BY doc_id
    """,
    doc="The streaming DSIR selector (streaming/sink.py "
    "stream_dsir_select, foreachBatch) under the hash gate: documents "
    "replay as two micro-batches; batch 1 bootstraps the raw bucket "
    "model and is scored against itself, batch 2 folds in and is "
    "scored against the full history — each batch's at-arrival weights "
    "are exactly a full-corpus dsir_weights over history-so-far with "
    "the frozen target (all en docs), which is what the oracle's two "
    "ratio stages replay.  The Spark side runs the REAL sink with "
    "checkpointing and append-mode model folds.",
)
def stream_dsir_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from ..ext.dsir import dsir_model_counts
    from ..streaming.sink import stream_dsir_select

    d = load_tables(spark, sf_dir, "documents")["documents"]
    target_model = dsir_model_counts(
        d.filter(F.col("lang") == "en"), "doc_id", "text", num_buckets=64
    )
    root = tempfile.mkdtemp(prefix="riab_sdsir_")
    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir)
    for i, half in enumerate(
        (d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1))
    ):
        tmp = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
    out_dir = os.path.join(root, "out")
    query = (
        stream_dsir_select(
            spark.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir),
            out_dir=out_dir,
            model_dir=os.path.join(root, "model"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            target_model=target_model,
            num_buckets=64,
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir).select("doc_id", "logw_micro")


def _register_stream_ivfpq() -> None:
    # late import so plans/extensions.py's oracle builder is reused
    # verbatim — one replay gates the batch build, the persisted round
    # trip, the incremental append, AND this streaming growth path
    from .extensions import _pq_oracle

    @register(
        "stream_ivfpq_batch",
        oracle=_pq_oracle(ivf_c=16, nprobe=8),
        doc="Streaming IVFADC index growth (streaming/sink.py "
        "stream_ivfpq_append) under the hash gate: embeddings replay "
        "as two micro-batches through the REAL foreachBatch sink with "
        "checkpointing, each batch encoded against the FROZEN coarse "
        "centroids + PQ codebooks into its OWN batch=<id> partition "
        "subdir (overwrite — at-least-once replay replaces, never "
        "duplicates, so index contents are exactly-once without a "
        "ledger).  Search over the streamed layout must equal a "
        "single-shot build: the SAME full-replay oracle as "
        "ext_ivfpq_topk / _persisted / _incremental gates it.",
    )
    def stream_ivfpq_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
        import glob
        import os
        import shutil
        import tempfile

        from ..core.caching import track_cache
        from ..ext.ivfpq import ivfpq_search
        from ..ext.pq import l2_normalize, train_pq_codebooks
        from ..streaming.sink import stream_ivfpq_append

        e = l2_normalize(
            load_tables(spark, sf_dir, "embeddings")["embeddings"], "embedding"
        )
        centroids = e.filter(F.col("vec_id") < 16)
        books = train_pq_codebooks(
            e, m=16, ksub=32, iterations=2, grid=6
        ).persist()
        root = tempfile.mkdtemp(prefix="riab_sivfpq_")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        for i, half in enumerate(
            (e.filter(F.col("vec_id") % 2 == 0),
             e.filter(F.col("vec_id") % 2 == 1))
        ):
            tmp = os.path.join(root, f"half{i}")
            half.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(in_dir, f"{i:02d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
        index_dir = os.path.join(root, "index")
        query = (
            stream_ivfpq_append(
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(in_dir),
                index_dir,
                os.path.join(root, "ckpt"),
                centroids,
                books,
                m=16,
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        reloaded = spark.read.parquet(index_dir)
        queries = e.filter(F.col("vec_id") < 10)
        out = ivfpq_search(
            reloaded, centroids, books, e, queries, m=16, k=3, nprobe=8,
            shortlist=32,
        )
        return track_cache(out, [books])


_register_stream_ivfpq()


def _register_stream_semdedup() -> None:
    # late import so the two-batch incremental SemDeDup replay oracle is
    # reused verbatim — one replay gates the batch incremental operator
    # AND this streaming growth path
    from .extensions import _inc_semdedup_oracle

    @register(
        "stream_semdedup_batch",
        oracle=_inc_semdedup_oracle(),
        doc="Streaming SemDeDup (streaming/sink.py stream_semantic_dedup, "
        "r12) under the hash gate: embeddings replay as two micro-batches "
        "through the REAL foreachBatch sink with checkpointing, each "
        "batch screened against the persisted kept-exemplar index "
        "(frozen batch-1 Lloyd centroids), flags and surviving exemplars "
        "written to per-batch overwrite subdirs — exactly-once by VALUE "
        "on replay because each batch screens only strictly-earlier "
        "index subdirs.  Batch 2's flags must equal the batch "
        "incremental operator's: the SAME full two-batch replay oracle "
        "as ext_incremental_semantic_dedup gates both.",
    )
    def stream_semdedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
        import glob
        import os
        import shutil
        import tempfile

        from ..ext.ivf import refine_centroids
        from ..streaming.sink import stream_semantic_dedup

        e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        b1 = e.filter(F.col("vec_id") < 250)
        # pin the frozen centroids: the sink's closure re-evaluates the
        # centroid frame once per micro-batch op (assignment collect +
        # screen), and without the pin each evaluation re-runs the
        # 3-round Lloyd lineage — C x d metadata, released after the
        # stream drains
        cents = refine_centroids(
            b1, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
        ).persist()
        root = tempfile.mkdtemp(prefix="riab_ssemdedup_")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        for i, half in enumerate((b1, e.filter(F.col("vec_id") >= 250))):
            tmp = os.path.join(root, f"half{i}")
            half.coalesce(1).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(in_dir, f"{i:02d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))
        out_dir = os.path.join(root, "out")
        query = (
            stream_semantic_dedup(
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(in_dir),
                out_dir=out_dir,
                index_dir=os.path.join(root, "index"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                centroids=cents,
                tau=0.35,
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        cents.unpersist()
        # the oracle replays batch 2's flags (vec_id >= 250)
        return (
            spark.read.parquet(out_dir)
            .filter(F.col("vec_id") >= 250)
            .select("vec_id", "centroid_id", "is_dup")
        )


_register_stream_semdedup()
