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


def test_plausible_value_high(spark):
    from rabbit_in_a_blender_spark.quality.checks import plausible_value_high

    df = spark.createDataFrame([(1.0,), (99.0,), (None,)], "v double")
    r = _one(plausible_value_high(df, "v", 50))
    assert r["num_violated_rows"] == 1


def test_concept_completeness(spark):
    from rabbit_in_a_blender_spark.quality.checks import concept_completeness

    df = spark.createDataFrame([(0,), (42,), (None,)], "c int")
    r = _one(concept_completeness(df, "c"))
    assert r["num_violated_rows"] == 2


def test_cdm_datatype(spark):
    from rabbit_in_a_blender_spark.quality.checks import cdm_datatype

    df = spark.createDataFrame([("12",), ("abc",), (None,)], "v string")
    r = _one(cdm_datatype(df, "v", "bigint"))
    assert r["num_violated_rows"] == 1


def test_fk_domain(spark):
    from rabbit_in_a_blender_spark.quality.checks import fk_domain

    df = spark.createDataFrame([(8507,), (99,), (0,)], "gender_concept_id int")
    concept = spark.createDataFrame(
        [(8507, "Gender"), (99, "Drug")], "concept_id int, domain_id string"
    )
    r = _one(fk_domain(df, "gender_concept_id", concept, ["Gender"]))
    assert r["num_violated_rows"] == 1  # 99→Drug violates; 0 is unmapped, not checked


def test_within_visit_dates(spark):
    import datetime

    from rabbit_in_a_blender_spark.quality.checks import within_visit_dates

    d = datetime.datetime
    fact = spark.createDataFrame(
        [(1, 10, d(2020, 1, 5)), (2, 10, d(2020, 2, 1)), (3, 99, d(2020, 1, 1))],
        "id int, visit_id int, fact_date timestamp",
    )
    visit = spark.createDataFrame(
        [(10, d(2020, 1, 1), d(2020, 1, 31))],
        "visit_id int, visit_start timestamp, visit_end timestamp",
    )
    r = _one(
        within_visit_dates(fact, visit, "visit_id", "fact_date", "visit_id", "visit_start", "visit_end")
    )
    assert r["num_violated_rows"] == 1  # fact 2 outside; fact 3 has no visit
