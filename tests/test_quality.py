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


def test_measure_person_completeness(spark):
    from rabbit_in_a_blender_spark.quality.checks import measure_person_completeness

    person = spark.createDataFrame([(1,), (2,), (3,)], "person_id int")
    fact = spark.createDataFrame([(1,), (1,), (3,)], "person_id int")
    r = _one(measure_person_completeness(person, fact, "person_id", "person_id"))
    assert r["num_violated_rows"] == 1 and r["num_denominator_rows"] == 3


def test_cdm_table_and_field_metadata_checks(spark):
    from rabbit_in_a_blender_spark.quality.checks import cdm_field, cdm_table

    assert cdm_table(True, "person")[1] == 0
    assert cdm_table(False, "gone")[1] == 1
    df = spark.createDataFrame([(1,)], "a int")
    assert cdm_field(df, "a")[1] == 0
    assert cdm_field(df, "b")[1] == 1


def test_is_primary_key(spark):
    from rabbit_in_a_blender_spark.quality.checks import is_primary_key

    df = spark.createDataFrame([(1,), (2,), (2,), (3,)], "pk int")
    r = _one(is_primary_key(df, "pk"))
    assert r["num_violated_rows"] == 2  # both rows of the duplicated key


def test_fk_class(spark):
    from rabbit_in_a_blender_spark.quality.checks import fk_class

    df = spark.createDataFrame([(10,), (20,), (0,)], "c int")
    concept = spark.createDataFrame(
        [(10, "Clinical Finding"), (20, "Ingredient")],
        "concept_id int, concept_class_id string",
    )
    r = _one(fk_class(df, "c", concept, ["Clinical Finding"]))
    assert r["num_violated_rows"] == 1


def test_value_and_source_completeness(spark):
    from rabbit_in_a_blender_spark.quality.checks import (
        measure_value_completeness,
        source_concept_completeness,
        source_value_completeness,
    )

    df = spark.createDataFrame(
        [(None, 0, " "), (5, 42, "ok"), (6, None, None)],
        "v int, sc int, sv string",
    )
    assert _one(measure_value_completeness(df, "v"))["num_violated_rows"] == 1
    assert _one(source_concept_completeness(df, "sc"))["num_violated_rows"] == 2
    assert _one(source_value_completeness(df, "sv"))["num_violated_rows"] == 2


def test_plausible_after_birth_and_before_death(spark):
    import datetime

    from rabbit_in_a_blender_spark.quality.checks import (
        plausible_after_birth,
        plausible_before_death,
    )

    d = datetime.datetime
    person = spark.createDataFrame(
        [(1, d(1990, 1, 1)), (2, d(2000, 6, 15))],
        "person_id int, birth timestamp",
    )
    fact = spark.createDataFrame(
        [(1, d(1989, 12, 31)), (1, d(1991, 1, 1)), (2, d(2000, 6, 15)), (9, d(1970, 1, 1))],
        "person_id int, fact_date timestamp",
    )
    r = _one(
        plausible_after_birth(fact, person, "person_id", "fact_date", "person_id", "birth")
    )
    assert r["num_violated_rows"] == 1  # event before birth; unknown person skipped

    death = spark.createDataFrame([(1, d(1995, 1, 1))], "person_id int, dd timestamp")
    r2 = _one(
        plausible_before_death(fact, death, "person_id", "fact_date", "person_id", "dd")
    )
    # 1991-01-01 is before death; only events >60d after 1995-01-01 violate
    assert r2["num_violated_rows"] == 0


def test_plausible_gender(spark):
    from rabbit_in_a_blender_spark.quality.checks import plausible_gender

    person = spark.createDataFrame(
        [(1, 8507), (2, 8532)], "person_id int, gender_concept_id int"
    )
    # concept 4000 requires male (8507)
    fact = spark.createDataFrame(
        [(1, 4000), (2, 4000), (2, 5000)], "person_id int, c int"
    )
    r = _one(plausible_gender(fact, person, "person_id", "c", {4000: 8507}))
    assert r["num_violated_rows"] == 1  # person 2 is female for male-only concept


def test_plausible_unit_concept_ids(spark):
    from rabbit_in_a_blender_spark.quality.checks import plausible_unit_concept_ids

    df = spark.createDataFrame(
        [(3000, 100), (3000, 999), (3000, None), (4000, 1)],
        "c int, unit int",
    )
    r = _one(plausible_unit_concept_ids(df, "c", "unit", {3000: [100, 101]}))
    assert r["num_violated_rows"] == 1  # 999 not allowed; NULL + out-of-scope skipped
