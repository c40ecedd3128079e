"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.M extension surface — the reference is batch-only).

``running_counts`` keeps a per-key running aggregate across micro-batches
with timeout-based state eviction — the canonical custom-stateful shape
Spark's built-in windows can't express (e.g. cumulative per-user counters
that survive across windows).

Scale: state lives in the executor state store partitioned by key;
memory is bounded by (active keys × state row), and the processing-time
timeout evicts idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    from rabbit_in_a_blender_spark.ext._rounding import round_half_up

    if state.hasTimedOut:
        # Idle-timeout callback: no new rows for this key.  Evict instead
        # of re-arming, otherwise the documented "evict after 1h idle"
        # never fires and per-key state grows unboundedly (ADVICE r8).
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    state.setTimeoutDuration(3600 * 1000)  # evict after 1h idle
    # HALF_UP like F.round so the batch-twin oracle comparison holds on
    # .5 ties (Python round is half-even — same class as ADVICE r7)
    total_r = float(round_half_up(np.array([total]), 3)[0])
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total_r]}
    )


def running_counts(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) maintained across micro-batches.

    ``events`` must be a streaming DataFrame with user_id and value.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --- streaming trailing-window z-score ---------------------------------
#
# The streaming twin of ext/timeseries.py::rolling_zscore: per group, an
# epoch-aligned bucket accumulates (cents, n) until an event from a LATER
# bucket arrives; closing a bucket scores its average against the ring of
# previously-closed bucket averages and pushes it onto the ring.  State is
# (current bucket, its partials, a bounded ring) — a few dozen doubles per
# group regardless of event volume, the applyInPandasWithState sweet spot.
#
# Semantics (documented, test-pinned):
# - events are processed in ts order within each micro-batch (sorted);
# - an event for a bucket older than the current one is LATE: with
#   allowed_lateness=0 it is dropped (the bucket already closed — same
#   contract as a watermark); with allowed_lateness=N an event landing
#   in one of the last N CLOSED buckets reopens its partials and emits a
#   corrected row (update-style: consumers keep the last row per
#   (group, bucket)), matching Spark's withWatermark ergonomics;
# - a correction re-scores against the trailing ring as currently known
#   (it does NOT cascade re-scores into buckets that closed after it —
#   their rows already shipped);
# - the newest bucket per group stays open until a later event closes it,
#   so a finite replay emits one fewer row per group than the batch twin.
# - averages sit on the same exact cents grid as the batch operator, so
#   closed-bucket rows match rolling_zscore bit-for-bit.

ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_bucket", T.LongType()),
        T.StructField("cur_cents", T.LongType()),
        T.StructField("cur_n", T.LongType()),
        T.StructField("ring", T.ArrayType(T.DoubleType())),
        # last allowed_lateness closed buckets, reopenable for late data
        T.StructField("recent_buckets", T.ArrayType(T.LongType())),
        T.StructField("recent_cents", T.ArrayType(T.LongType())),
        T.StructField("recent_n", T.ArrayType(T.LongType())),
    ]
)

ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("bucket_ts", T.StringType()),
        T.StructField("avg_value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)


def _make_zscore_update(
    width_s: int,
    lookback: int,
    min_prev: int,
    threshold: float,
    allowed_lateness: int = 0,
):
    import datetime as _dt
    import math as _math

    def _score_row(key, bucket, avg, hist):
        """(group, ts, avg4, z, anomaly) when hist is deep enough and
        has spread; None otherwise.  hist = closed-bucket averages that
        precede ``bucket``."""
        if len(hist) < min_prev:
            return None
        window = hist[-lookback:]
        mu = sum(window) / len(window)
        var = sum((x - mu) ** 2 for x in window) / len(window)
        sigma = _math.sqrt(var)
        if sigma <= 0:
            return None
        z = round((avg - mu) / sigma, 3)
        ts = _dt.datetime.fromtimestamp(
            bucket * width_s, tz=_dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S")
        return (
            key,
            ts,
            _math.floor(avg * 10000) / 10000.0,
            z,
            abs(z) > threshold,
        )

    def _close(key, bucket, cents, n, ring, out_rows):
        avg = (cents / 100.0) / n
        row = _score_row(key, bucket, avg, ring)
        if row is not None:
            out_rows.append(row)
        ring.append(avg)
        del ring[:-lookback]

    def _late(key, b, c, ring, rb, rc, rn, out_rows):
        """Reopen a recently-closed bucket for a late event: fold the
        cents in, emit a corrected row scored against the history that
        preceded the bucket (as currently known), and patch its ring
        entry so later closes score against the corrected average.

        Drops (no fold, no emit): buckets older than the lateness
        horizon, in-horizon buckets that never closed with data (the
        operator reopens closed buckets, it does not open empty ones),
        and ring-evicted buckets.  The ring-evicted branch is
        unreachable while ``allowed_lateness <= lookback`` (enforced by
        stream_zscore): rb is capped at allowed_lateness and ring at
        lookback, both fed by the same close path, so
        ``off <= len(rb) <= len(ring)``.  The guard sits BEFORE the
        fold so stored partials can never silently diverge from
        emitted output (ADVICE r9)."""
        if b not in rb:
            return  # outside the horizon, or never closed with data
        i = rb.index(b)
        off = len(rb) - i  # 1-based distance from the newest close
        if off > len(ring):
            return  # ring entry evicted: drop whole, don't fold partials
        rc[i] += int(c)
        rn[i] += 1
        avg = (rc[i] / 100.0) / rn[i]
        hist = ring[: len(ring) - off]
        row = _score_row(key, b, avg, hist)
        if row is not None:
            out_rows.append(row)
        ring[len(ring) - off] = avg

    def _update_z(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_bucket, cur_cents, cur_n, ring, rb, rc, rn = state.get
            ring, rb, rc, rn = list(ring), list(rb), list(rc), list(rn)
        else:
            cur_bucket, cur_cents, cur_n = -1, 0, 0
            ring, rb, rc, rn = [], [], [], []
        out_rows: list[tuple] = []
        from rabbit_in_a_blender_spark.ext._rounding import to_cents_half_up

        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            secs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
            # HALF_UP cents, same grid as the batch twin's
            # F.round(value*100, 0) — pandas .round is half-even and the
            # old pre-round(2) diverged on half-ties (ADVICE r7)
            cents = to_cents_half_up(pdf["value"].to_numpy())
            for sec, c in zip(secs, cents):
                b = int(sec) // width_s
                if b < cur_bucket:
                    if allowed_lateness > 0:
                        _late(key[0], b, c, ring, rb, rc, rn, out_rows)
                    continue  # beyond lateness (or lateness 0): dropped
                if b > cur_bucket:
                    if cur_n > 0:
                        _close(key[0], cur_bucket, cur_cents, cur_n, ring, out_rows)
                        if allowed_lateness > 0:
                            rb.append(cur_bucket)
                            rc.append(cur_cents)
                            rn.append(cur_n)
                            del rb[:-allowed_lateness]
                            del rc[:-allowed_lateness]
                            del rn[:-allowed_lateness]
                    cur_bucket, cur_cents, cur_n = b, 0, 0
                cur_cents += int(c)
                cur_n += 1
        state.update((cur_bucket, cur_cents, cur_n, ring, rb, rc, rn))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["group_key", "bucket_ts", "avg_value", "zscore", "is_anomaly"],
            )

    return _update_z


def stream_zscore(
    events: DataFrame,
    group_col: str,
    width_s: int = 21600,
    lookback: int = 8,
    min_prev: int = 4,
    threshold: float = 2.0,
    allowed_lateness: int = 0,
) -> DataFrame:
    """Streaming trailing-window z-score over per-group time buckets.

    ``events`` must be a streaming DataFrame with ``group_col``, ``ts``
    (timestamp) and ``value`` (double).  Emits one row per CLOSED bucket
    that has enough history; matches the batch
    ``ext.timeseries.rolling_zscore`` on ordered replays (pytest-pinned).

    ``allowed_lateness=N`` keeps the partials of the last N closed
    buckets reopenable: a late event within that horizon emits a
    corrected row for its bucket (consumers keep the last row per
    (group, bucket)) and patches the trailing ring so subsequent closes
    score against the corrected average.  At the default 0 the operator
    is byte-identical to the watermark-style drop (batch-twin oracle
    unchanged).  State grows by 3·N longs per group — still O(lookback
    + lateness), executor-state-store friendly.

    ``allowed_lateness`` must be <= ``lookback``: the reopen patches a
    ring entry, so a horizon deeper than the ring would fold partials
    for buckets whose ring slot is already evicted — corrected state
    with no corrected output (ADVICE r9).  Late events for in-horizon
    buckets that never closed with data are dropped, not opened (see
    ``_late``).
    """
    if allowed_lateness > lookback:
        raise ValueError(
            f"allowed_lateness ({allowed_lateness}) must be <= lookback "
            f"({lookback}): corrections patch the trailing ring, which "
            "only keeps the last `lookback` closed buckets"
        )
    keyed = events.selectExpr(
        f"CAST({group_col} AS STRING) AS group_key", "ts", "value"
    )
    return keyed.groupBy("group_key").applyInPandasWithState(
        _make_zscore_update(width_s, lookback, min_prev, threshold, allowed_lateness),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming heavy hitters (Misra-Gries in state) ---------------------
#
# The streaming twin of ext/heavy.py::heavy_hitters: items route to a
# shard (same item -> same shard, so an item's full mass folds into ONE
# sketch), each shard keeps a Misra-Gries(k) sketch in state — at most
# k counters per shard regardless of stream length or universe size.
# The MG guarantee is order-independent: after ANY prefix, every item
# with frequency > n_shard/(k+1) holds a counter, so the candidate set
# is always a superset of the true heavy hitters and an exact batch-side
# re-count of the candidates yields the identical answer to the full
# groupBy — sketch noise can only add candidates the filter discards.
#
# State: (items, counts, n_seen) — bounded by k entries per shard.
# Output (update mode): per batch, each surviving counter plus a NULL
# sentinel row; every row carries the shard's cumulative n_seen, so a
# consumer takes the max-n_seen snapshot per shard as the final sketch.

MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

MG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("item", T.StringType()),
        T.StructField("count_lb", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _make_mg_update(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            for item in pdf["item"]:
                if item is None:
                    continue
                n += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for c in counters:
                        counters[c] -= 1
                        if counters[c] == 0:
                            dead.append(c)
                    for c in dead:
                        del counters[c]
        state.update((list(counters.keys()), list(counters.values()), n))
        survivors = sorted(counters)
        yield pd.DataFrame(
            {
                "shard": [key[0]] * (len(survivors) + 1),
                "item": survivors + [None],
                "count_lb": [counters[s] for s in survivors] + [0],
                "n_seen": [n] * (len(survivors) + 1),
            }
        )

    return update


def stream_heavy_hitters(
    items: DataFrame, item_col: str, k: int, shards: int = 8
) -> DataFrame:
    """Streaming Misra-Gries candidate tracking over ``items`` (a
    streaming DataFrame).  Route items by crc32 so an item's whole mass
    lands in one sketch; state is <= k counters per shard.

    The final snapshot (max-n_seen rows per shard) is a guaranteed
    superset of items with global frequency > n/(k+1); re-count the
    candidates exactly over stored data to get the same answer as the
    full groupBy — the two-pass contract of ext/heavy.py, with pass one
    streamed.
    """
    routed = items.select(
        F.col(item_col).cast("string").alias("item"),
        (F.crc32(F.col(item_col).cast("string")) % shards).alias("shard"),
    )
    return routed.groupBy("shard").applyInPandasWithState(
        _make_mg_update(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        # NoTimeout on purpose (ADVICE r10): unlike running_counts,
        # state here is bounded at k counters + one long per shard
        # regardless of stream length or universe size, so idle
        # eviction buys nothing — and a timeout remove() would silently
        # reset n_seen, breaking both the superset contract (candidates
        # ⊇ items with freq > n_shard/(k+1)) and the consumer's
        # max-n_seen snapshot rule across the timeout epoch on
        # long-running streams.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
