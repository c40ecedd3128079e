"""DQD check builders on seeded-violation fixtures (SURVEY §5)."""

from __future__ import annotations

import datetime

from rabbit_in_a_blender_spark.quality.checks import (
    fk_orphans,
    is_required,
    plausible_value_low,
    start_before_end,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_is_required(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    r = _one(is_required(df, "v"))
    assert (r["num_violated_rows"], r["num_denominator_rows"]) == (1, 3)


def test_plausible_value_low(spark):
    df = spark.createDataFrame([(0.5,), (2.0,), (None,)], "v double")
    r = _one(plausible_value_low(df, "v", 1.0))
    assert r["num_violated_rows"] == 1
    assert abs(r["pct_violated_rows"] - 1 / 3) < 1e-5


def test_fk_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    r = _one(fk_orphans(child, "fk", parent, "pk"))
    # NULL fk is not an orphan (isRequired's job), 99 is.
    assert (r["num_violated_rows"], r["num_denominator_rows"]) == (1, 4)


def test_start_before_end(spark):
    d = datetime.datetime
    df = spark.createDataFrame(
        [
            (d(2020, 1, 2), d(2020, 1, 1)),  # violated
            (d(2020, 1, 1), d(2020, 1, 2)),
            (None, d(2020, 1, 1)),
        ],
        "s timestamp, e timestamp",
    )
    r = _one(start_before_end(df, "s", "e"))
    assert r["num_violated_rows"] == 1
