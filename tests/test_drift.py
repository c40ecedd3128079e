"""Unit tests for ext/drift.py (PSI + two-sample KS)."""

from __future__ import annotations

from rabbit_in_a_blender_spark.ext.drift import ks_statistic, psi_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string, v double")


def test_psi_zero_for_identical_distribution(spark):
    rows = [("ref", float(i)) for i in range(1, 21)]
    rows += [("same", float(i)) for i in range(1, 21)]
    out = {r["s"]: r for r in psi_drift(_df(spark, rows), "s", "v", "ref").collect()}
    assert out["same"]["psi"] == 0.0
    assert out["same"]["n_docs"] == 20


def test_psi_large_for_shifted_distribution(spark):
    rows = [("ref", float(i)) for i in range(1, 21)]
    # shifted entirely above the reference's max → all mass in the top bin
    rows += [("shift", float(100 + i)) for i in range(1, 21)]
    out = {r["s"]: r for r in psi_drift(_df(spark, rows), "s", "v", "ref").collect()}
    # empty bins smoothed, psi finite and clearly above the 0.25 action bar
    assert out["shift"]["psi"] > 0.25


def test_psi_orders_mild_vs_severe_shift(spark):
    rows = [("ref", float(i)) for i in range(1, 41)]
    rows += [("mild", float(i + 4)) for i in range(1, 41)]
    rows += [("severe", float(i + 100)) for i in range(1, 41)]
    out = {r["s"]: r["psi"] for r in psi_drift(_df(spark, rows), "s", "v", "ref").collect()}
    assert 0 < out["mild"] < out["severe"]


def test_ks_zero_identical_one_disjoint(spark):
    rows = [("ref", float(i)) for i in range(1, 21)]
    rows += [("same", float(i)) for i in range(1, 21)]
    rows += [("disj", float(i + 1000)) for i in range(1, 21)]
    out = {r["s"]: r for r in ks_statistic(_df(spark, rows), "s", "v", "ref").collect()}
    assert out["same"]["ks"] == 0.0
    assert out["disj"]["ks"] == 1.0
    assert out["same"]["n_cand"] == 20 and out["same"]["n_ref"] == 20


def test_ks_known_half_overlap(spark):
    # ref = {1..10}, cand = {6..15}: max ECDF gap is 0.5 at value 10
    rows = [("ref", float(i)) for i in range(1, 11)]
    rows += [("half", float(i)) for i in range(6, 16)]
    out = ks_statistic(_df(spark, rows), "s", "v", "ref").collect()
    assert out[0]["ks"] == 0.5


def test_ks_tie_safe(spark):
    # heavy ties: cand is all 5.0, ref half 5.0 half 10.0 — ECDF evaluated
    # AFTER each value's full mass lands: at v=5 |1.0 - 0.5| = 0.5
    rows = [("ref", 5.0)] * 5 + [("ref", 10.0)] * 5 + [("tied", 5.0)] * 8
    out = ks_statistic(_df(spark, rows), "s", "v", "ref").collect()
    assert out[0]["ks"] == 0.5


def _cat(spark, rows):
    return spark.createDataFrame(rows, "s string, c string")


def test_jsd_zero_identical_and_ln2_disjoint(spark):
    from math import log

    from rabbit_in_a_blender_spark.ext.drift import jsd_drift

    rows = [("ref", x) for x in ("a", "a", "b", "c")]
    rows += [("same", x) for x in ("a", "a", "b", "c")]
    rows += [("disj", x) for x in ("d", "d", "e", "e")]
    out = {r["s"]: r for r in jsd_drift(_cat(spark, rows), "s", "c", "ref").collect()}
    assert out["same"]["jsd"] == 0.0
    assert out["disj"]["jsd"] == round(log(2), 4)  # disjoint supports → ln 2
    assert out["same"]["n_docs"] == 4


def test_jsd_symmetric_in_magnitude_ordering(spark):
    from rabbit_in_a_blender_spark.ext.drift import jsd_drift

    rows = [("ref", "a")] * 8 + [("ref", "b")] * 2
    rows += [("mild", "a")] * 7 + [("mild", "b")] * 3
    rows += [("wild", "a")] * 1 + [("wild", "b")] * 9
    out = {r["s"]: r["jsd"] for r in jsd_drift(_cat(spark, rows), "s", "c", "ref").collect()}
    assert 0 < out["mild"] < out["wild"]
