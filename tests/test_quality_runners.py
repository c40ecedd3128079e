"""DQD runner (thresholds, summary, persistence) and Achilles runner."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from rabbit_in_a_blender_spark.pipeline.warehouse import Warehouse
from rabbit_in_a_blender_spark.quality.achilles import (
    counts_analysis,
    dist_analysis,
    run_analyses,
)
from rabbit_in_a_blender_spark.quality.checks import is_required, plausible_value_low
from rabbit_in_a_blender_spark.quality.dqd import run_checks, summarize


@pytest.fixture()
def wh():
    d = tempfile.mkdtemp(prefix="riab_q_")
    yield Warehouse(d)
    shutil.rmtree(d, ignore_errors=True)


def _fixture_df(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0)], "id int, v double"
    )


def test_run_checks_thresholds_and_persistence(spark, wh):
    df = _fixture_df(spark)
    checks = {
        "isRequired_id": lambda s: is_required(df, "id"),
        "plausibleValueLow_v": lambda s: plausible_value_low(df, "v", 0.0),
    }
    # 1/3 violated each; threshold 0.5 passes, 0.0 fails
    results = run_checks(
        spark, wh, checks, thresholds={"isRequired_id": 0.5}, default_threshold=0.0
    )
    by_name = {r["check_name"]: r for r in results.collect()}
    assert by_name["isRequired_id"]["failed"] == 0
    assert by_name["plausibleValueLow_v"]["failed"] == 1
    assert wh.exists("dqd", "dqdashboard_results")

    s = summarize(results).collect()[0]
    assert (s["num_checks"], s["num_failed"], s["num_passed"]) == (2, 1, 1)


def test_achilles_runner_shapes(spark, wh):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "g string, v double"
    )
    out = run_analyses(
        spark,
        wh,
        {
            1: lambda s: counts_analysis(df, 1, ["g"]),
            2: lambda s: dist_analysis(df, 2, "v", ["g"]),
        },
    )
    res = {r["stratum_1"]: r["count_value"] for r in out["achilles_results"].collect()}
    assert res == {"a": 2, "b": 1}
    dist = {r["stratum_1"]: r for r in out["achilles_results_dist"].collect()}
    assert dist["a"]["median_value"] == 2.0
    assert dist["a"]["stratum_2"] is None
    assert wh.exists("achilles", "achilles_results")
