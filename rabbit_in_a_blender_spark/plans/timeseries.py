"""Catalog rows for the time-series rollup and closed-form regression
extensions (`ext/timeseries.py`, `ext/regress.py`).

Time-series rows run over `events` on a 6-hour epoch-aligned UTC grid;
regression rows fit characters-per-word models per language over
`documents`.  Oracles replay the identical formulas (epoch-grid
bucketing, running-count LOCF carry groups, covar/var closed form) in
DuckDB SQL — see plans/catalog.py for the rounding/format conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..ext.regress import grouped_linreg, residual_outliers
from ..ext.timeseries import rollup_gapfill, rolling_zscore
from .catalog import register

_BUCKET_SQL = "make_timestamp(CAST(floor(epoch(ts)/21600)*21600 AS BIGINT)*1000000)"


@register(
    "ext_ts_rollup_gapfill",
    oracle=f"""
    WITH roll AS (
      SELECT event_type, {_BUCKET_SQL} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100 / COUNT(*)) / 10000.0
               AS avg_v,
             ROUND(MAX(value), 4) AS max_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM roll GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
      FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.bucket,
             COALESCE(r.n_events, 0) AS n_events, r.avg_v, r.max_value,
             COUNT(r.avg_v) OVER (PARTITION BY s.event_type ORDER BY s.bucket) AS grp
      FROM spine s LEFT JOIN roll r
        ON s.event_type = r.event_type AND s.bucket = r.bucket
    )
    SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           CAST(n_events AS BIGINT) AS n_events,
           MAX(avg_v) OVER (PARTITION BY event_type, grp) AS avg_value_locf,
           max_value
    FROM joined
    """,
    doc="Hypertable rollup: 6h downsample, dense bucket spine, LOCF gap fill.",
)
def ext_ts_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return rollup_gapfill(e, "event_type", "ts", "value", width_s=21600)


@register(
    "ext_ts_rolling_zscore",
    oracle=f"""
    WITH roll AS (
      SELECT event_type, {_BUCKET_SQL} AS bucket,
             (SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_v
      FROM events GROUP BY 1, 2
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
    SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           avg4 AS avg_value,
           ROUND((avg_v - mu) / sigma, 3) AS zscore,
           abs(ROUND((avg_v - mu) / sigma, 3)) > 2 AS is_anomaly
    FROM scored WHERE n_prev >= 4 AND sigma > 0
    """,
    doc="Trailing-window z-score anomaly flags over 6h bucket averages.",
)
def ext_ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return rolling_zscore(e, "event_type", "ts", "value", width_s=21600)


@register(
    "ext_percentile_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    doc=(
        "Exact interpolated percentiles per event_type (Spark percentile == "
        "DuckDB quantile_cont). Exact percentile sorts each group — fine for "
        "low-cardinality telemetry groups; at 100 TB with huge groups swap in "
        "approx_percentile (same call shape, sketch-merged, no sort)."
    ),
)
def ext_percentile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "ext_percentile_approx",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM events GROUP BY event_type
    """,
    doc=(
        "approx_percentile (the 100 TB path: sketch-merged, no per-group "
        "sort) under an invariant oracle, the same upgrade HLL got "
        "(VERDICT r7 task 3 pattern): accuracy=1000 guarantees rank "
        "error <= 1/1000; the checked bracket uses a 2% rank margin — "
        "20x looser than the guarantee but immune to the interpolation "
        "off-by-one of percentile_cont on small groups (the sketch "
        "returns a data VALUE whose rank is bounded, while the exact "
        "interpolated quantile at p±1e-3 can sit between data points) — "
        "so a broken sketch or mis-set accuracy still flips the hash."
    ),
)
def ext_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    acc = 1000
    eps = 0.02
    e = load_tables(spark, sf_dir, "events")["events"]
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.approx_percentile("value", F.lit(0.5), F.lit(acc)).alias("__a50"),
        F.approx_percentile("value", F.lit(0.95), F.lit(acc)).alias("__a95"),
        F.percentile("value", F.lit(0.5 - eps)).alias("__lo50"),
        F.percentile("value", F.lit(0.5 + eps)).alias("__hi50"),
        F.percentile("value", F.lit(0.95 - eps)).alias("__lo95"),
        F.percentile("value", F.lit(min(0.95 + eps, 1.0))).alias("__hi95"),
    )
    return agg.select(
        "event_type",
        "n_events",
        ((F.col("__a50") >= F.col("__lo50")) & (F.col("__a50") <= F.col("__hi50")))
        .alias("p50_within_bound"),
        ((F.col("__a95") >= F.col("__lo95")) & (F.col("__a95") <= F.col("__hi95")))
        .alias("p95_within_bound"),
    )


_XY_SQL = """
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS x,
         CAST(n_chars AS DOUBLE) AS y
  FROM documents
"""


@register(
    "ext_regr_fit",
    oracle=f"""
    WITH xy AS ({_XY_SQL}),
    agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             covar_pop(y, x) AS cov, var_pop(x) AS varx,
             AVG(x) AS mx, AVG(y) AS my, var_pop(y) AS vary
      FROM xy GROUP BY lang
    )
    SELECT lang, n, ROUND(cov / varx, 4) AS slope,
           ROUND(my - (cov / varx) * mx, 4) AS intercept,
           ROUND(CASE WHEN varx * vary > 0 THEN cov * cov / (varx * vary) END, 4) AS r2
    FROM agg WHERE varx > 0
    """,
    doc="Per-language OLS fit of n_chars on word count (closed form, one agg pass).",
)
def ext_regr_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return grouped_linreg(
        d.withColumn("n_words", F.size(F.split("text", " "))), "lang", "n_words", "n_chars"
    )


@register(
    "ext_regr_outliers",
    oracle=f"""
    WITH xy AS ({_XY_SQL}),
    model AS (
      SELECT lang, covar_pop(y, x) / var_pop(x) AS slope,
             AVG(y) - (covar_pop(y, x) / var_pop(x)) * AVG(x) AS icept
      FROM xy GROUP BY lang HAVING var_pop(x) > 0
    ),
    scored AS (
      SELECT xy.lang, xy.doc_id, xy.x, xy.y,
             ROUND(xy.y - (m.icept + m.slope * xy.x), 4) AS resid
      FROM xy JOIN model m ON xy.lang = m.lang
    )
    SELECT lang, doc_id, CAST(x AS BIGINT) AS x_value, CAST(y AS BIGINT) AS y_value,
           resid, CAST(rn AS BIGINT) AS rank_in_group
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY abs(resid) DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
    doc="Top-5 docs per language by |OLS residual|; broadcast model, rounded rank key.",
)
def ext_regr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return residual_outliers(
        d.withColumn("n_words", F.size(F.split("text", " "))),
        "lang",
        "doc_id",
        "n_words",
        "n_chars",
        k=5,
    )


@register(
    "ext_ts_qc_chain",
    oracle=f"""
    WITH roll AS (
      SELECT event_type, {_BUCKET_SQL} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             (SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM roll GROUP BY 1
    ),
    spine AS (
      SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
      FROM bounds
    ),
    dense AS (
      SELECT s.event_type, s.bucket, COALESCE(r.n_events, 0) AS n_events
      FROM spine s LEFT JOIN roll r
        ON s.event_type = r.event_type AND s.bucket = r.bucket
    ),
    grid_stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(COUNT(*) FILTER (n_events = 0) AS BIGINT) AS n_gaps,
             ROUND(COUNT(*) FILTER (n_events = 0) * 1.0 / COUNT(*), 4) AS gap_frac
      FROM dense GROUP BY event_type
    ),
    scored AS (
      SELECT event_type, avg_v,
             COUNT(avg_v) OVER w AS n_prev,
             AVG(avg_v) OVER w AS mu,
             stddev_pop(avg_v) OVER w AS sigma
      FROM roll
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
    ),
    anom AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (abs(ROUND((avg_v - mu) / sigma, 3)) > 2)
                  AS BIGINT) AS n_anomalies,
             MAX(abs(ROUND((avg_v - mu) / sigma, 3))) AS max_abs_z
      FROM scored WHERE n_prev >= 4 AND sigma > 0 GROUP BY event_type
    )
    SELECT g.event_type, g.n_buckets, g.n_gaps, g.gap_frac,
           COALESCE(a.n_anomalies, 0) AS n_anomalies, a.max_abs_z
    FROM grid_stats g LEFT JOIN anom a ON g.event_type = a.event_type
    """,
    doc="Per-series QC capstone composing the rollup grid and the "
    "anomaly screen: bucket/gap tallies + anomaly counts in one row "
    "per series (both inputs are already-aggregated bucket frames).",
)
def ext_ts_qc_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    grid = (
        rollup_gapfill(e, "event_type", "ts", "value", width_s=21600)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum(F.when(F.col("n_events") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_gaps"),
        )
        .withColumn(
            "gap_frac", F.round(F.col("n_gaps") / F.col("n_buckets"), 4)
        )
    )
    anom = (
        rolling_zscore(e, "event_type", "ts", "value", width_s=21600)
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0))
            .cast("long")
            .alias("n_anomalies"),
            F.max(F.abs(F.col("zscore"))).alias("max_abs_z"),
        )
    )
    return grid.join(anom, "event_type", "left").select(
        "event_type",
        "n_buckets",
        "n_gaps",
        "gap_frac",
        F.coalesce("n_anomalies", F.lit(0)).cast("long").alias("n_anomalies"),
        "max_abs_z",
    )
