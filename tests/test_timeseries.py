"""Unit tests for ext/timeseries.py and ext/regress.py semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.ext.regress import grouped_linreg, residual_outliers
from rabbit_in_a_blender_spark.ext.timeseries import rollup_gapfill, rolling_zscore

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def test_rollup_densifies_and_carries_forward(spark):
    # buckets (1h grid): 00 has data, 01 gap, 02 gap, 03 has data
    rows = [
        ("a", T0 + dt.timedelta(minutes=10), 10.0),
        ("a", T0 + dt.timedelta(minutes=50), 20.0),
        ("a", T0 + dt.timedelta(hours=3, minutes=5), 40.0),
    ]
    out = rollup_gapfill(_events(spark, rows), "g", "ts", "v", width_s=3600)
    got = {r["bucket_ts"]: r.asDict() for r in out.collect()}
    assert sorted(got) == [
        "2024-01-01 00:00:00",
        "2024-01-01 01:00:00",
        "2024-01-01 02:00:00",
        "2024-01-01 03:00:00",
    ]
    assert got["2024-01-01 00:00:00"]["n_events"] == 2
    assert got["2024-01-01 00:00:00"]["avg_value_locf"] == 15.0
    # gap buckets: zero count, NULL raw max, carried average
    for gap in ("2024-01-01 01:00:00", "2024-01-01 02:00:00"):
        assert got[gap]["n_events"] == 0
        assert got[gap]["max_value"] is None
        assert got[gap]["avg_value_locf"] == 15.0
    assert got["2024-01-01 03:00:00"]["avg_value_locf"] == 40.0


def test_rollup_spine_is_per_group(spark):
    # group b spans a different window than group a; spines must not leak
    rows = [
        ("a", T0, 1.0),
        ("a", T0 + dt.timedelta(hours=2), 2.0),
        ("b", T0 + dt.timedelta(hours=10), 3.0),
    ]
    out = rollup_gapfill(_events(spark, rows), "g", "ts", "v", width_s=3600)
    counts = dict(
        out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert counts == {"a": 3, "b": 1}


def test_rollup_avg_is_exact_on_half_ties(spark):
    # 16 values summing to a .00005-tie under ROUND(AVG): the cents-grid
    # floor must be deterministic (this is the exact failure the oracle
    # gate caught on sf0.01: 881.94 / 16 = 55.12125)
    rows = [("a", T0 + dt.timedelta(seconds=i), 55.12) for i in range(15)] + [
        ("a", T0, 57.06)
    ]
    out = rollup_gapfill(_events(spark, rows), "g", "ts", "v", width_s=3600).collect()
    assert out[0]["avg_value_locf"] == 55.2412  # floor(88386*100/16)/10000


def test_rolling_zscore_flags_spike(spark):
    # 9 calm hourly buckets then a spike; spike z >> 2
    rows = [("a", T0 + dt.timedelta(hours=h), 10.0 + (h % 2)) for h in range(9)]
    rows.append(("a", T0 + dt.timedelta(hours=9), 100.0))
    out = rolling_zscore(
        _events(spark, rows), "g", "ts", "v", width_s=3600, lookback=8, min_prev=4
    )
    got = {r["bucket_ts"]: r for r in out.collect()}
    spike = got["2024-01-01 09:00:00"]
    assert spike["is_anomaly"] is True and spike["zscore"] > 2
    # calm buckets that have enough history are not flagged
    calm = [r for ts, r in got.items() if ts != "2024-01-01 09:00:00"]
    assert calm and all(not r["is_anomaly"] for r in calm)


def test_rolling_zscore_excludes_current_bucket_from_baseline(spark):
    # constant history → sigma 0 → row dropped rather than z = inf/NaN
    rows = [("a", T0 + dt.timedelta(hours=h), 5.0) for h in range(6)]
    rows.append(("a", T0 + dt.timedelta(hours=6), 50.0))
    out = rolling_zscore(
        _events(spark, rows), "g", "ts", "v", width_s=3600, lookback=8, min_prev=4
    ).collect()
    assert out == []  # sigma of the constant baseline is 0 everywhere


def _docs(spark):
    rows = []
    # lang "en": y = 5x + 2 exactly; one outlier doc breaks the line
    for i in range(20):
        rows.append(("en", i, float(i + 1), float(5 * (i + 1) + 2)))
    rows.append(("en", 99, 10.0, 500.0))
    # lang "fr": exact line, no outlier → perfect fit
    rows += [("fr", 300 + i, float(i + 1), float(5 * (i + 1) + 2)) for i in range(10)]
    # lang "zz": zero x-variance → dropped from the fit
    rows += [("zz", 200 + i, 3.0, float(i)) for i in range(4)]
    return spark.createDataFrame(rows, "lang string, doc_id long, x double, y double")


def test_grouped_linreg_recovers_exact_line(spark):
    fit = {r["lang"]: r for r in grouped_linreg(_docs(spark), "lang", "x", "y").collect()}
    assert "zz" not in fit  # var(x) = 0 → undefined slope → dropped
    fr = fit["fr"]
    assert (fr["slope"], fr["intercept"], fr["r2"]) == (5.0, 2.0, 1.0)
    en = fit["en"]
    assert en["n"] == 21
    # the outlier pulls the slope off 5.0 and wrecks r2, but the closed
    # form stays finite and sane
    assert abs(en["slope"] - 5.0) < 2.0 and 0 < en["r2"] < 1


def test_residual_outliers_ranks_the_planted_outlier_first(spark):
    out = residual_outliers(_docs(spark), "lang", "doc_id", "x", "y", k=3).collect()
    en = [r for r in out if r["lang"] == "en"]
    assert len(en) == 3
    assert en[0]["doc_id"] == 99 and en[0]["rank_in_group"] == 1
    assert abs(en[0]["resid"]) > abs(en[1]["resid"])


def test_residual_outliers_k_bound_per_group(spark):
    rows = [("a", i, float(i), float(2 * i + (i % 3))) for i in range(30)]
    rows += [("b", 100 + i, float(i), float(i * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, x double, y double")
    out = residual_outliers(df, "lang", "doc_id", "x", "y", k=4)
    counts = dict(out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect())
    assert counts == {"a": 4, "b": 4}


def test_rollup_handles_negative_values(spark):
    # floor-grid semantics hold for negatives too: cents sum -1075,
    # floor(-1075*100/2)/10000 = floor(-53750)/10000 = -5.375 exactly
    rows = [("a", T0, -10.50), ("a", T0 + dt.timedelta(minutes=5), -0.25)]
    out = rollup_gapfill(_events(spark, rows), "g", "ts", "v", width_s=3600).collect()
    assert len(out) == 1
    assert out[0]["avg_value_locf"] == -5.375
    assert out[0]["max_value"] == -0.25
