"""Metadata-driven DQD sweep tests: enumeration breadth over the full
CDM 5.4 registry, seeded-violation detection, threshold semantics
(reference data_quality.py:57-101, 209-224, 322-347)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.core.cdm54 import cdm54_registry
from rabbit_in_a_blender_spark.quality.dqd_sweep import run_sweep


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="module")
def cdm(spark):
    person = spark.createDataFrame(
        [
            # seeded: person 2 NULL gender; person 3 implausible birth year;
            # person 4 duplicated pk
            (1, 8507, 1970, dt.datetime(1970, 3, 1), 8527, 38003563),
            (2, None, 1980, dt.datetime(1980, 1, 1), 8527, 38003563),
            (3, 8532, 1800, dt.datetime(1800, 1, 1), 8516, 0),
            (4, 8507, 1990, dt.datetime(1990, 6, 1), 8516, 0),
            (4, 8507, 1990, dt.datetime(1990, 6, 1), 8516, 0),
        ],
        "person_id long, gender_concept_id long, year_of_birth long, "
        "birth_datetime timestamp, race_concept_id long, ethnicity_concept_id long",
    )
    condition = spark.createDataFrame(
        [
            # seeded: row 21 end<start; row 22 orphan person 99; row 23
            # concept 0; row 24 pre-birth date for person 1 (born 1970)
            (20, 1, 201826, _d("2020-02-01"), _d("2020-02-10"), 44820889),
            (21, 1, 201826, _d("2020-04-10"), _d("2020-04-01"), 0),
            (22, 99, 4329847, _d("2020-07-02"), None, 0),
            (23, 3, 0, _d("2020-08-01"), None, 0),
            (24, 1, 201826, _d("1960-01-01"), None, 0),
        ],
        "condition_occurrence_id long, person_id long, condition_concept_id long, "
        "condition_start_date date, condition_end_date date, "
        "condition_source_concept_id long",
    )
    death = spark.createDataFrame(
        [(3, _d("2020-06-01"), 0)],
        "person_id long, death_date date, death_type_concept_id long",
    )
    tables = {"person": person, "condition_occurrence": condition, "death": death}
    return tables.get


def test_sweep_enumerates_hundreds_of_checks(spark, cdm):
    res = run_sweep(spark, cdm, cdm54_registry()).cache()
    total = res.count()
    # one call sweeps the whole CDM: 39 cdmTable rows + per-column
    # field/datatype rows + data-level checks on the 3 present tables
    assert total >= 100
    fams = {r["check_family"] for r in res.select("check_family").distinct().collect()}
    assert {
        "cdmTable",
        "cdmField",
        "cdmDatatype",
        "isRequired",
        "isPrimaryKey",
        "isForeignKey",
        "plausibleValueLow",
        "plausibleStartBeforeEnd",
        "plausibleAfterBirth",
        "plausibleBeforeDeath",
        "standardConceptRecordCompleteness",
        "sourceConceptRecordCompleteness",
        "measurePersonCompleteness",
    } <= fams
    res.unpersist()


def test_sweep_detects_seeded_violations(spark, cdm):
    res = run_sweep(spark, cdm, cdm54_registry())
    rows = {r["check_name"]: r for r in res.collect()}

    # absent table → cdmTable violated
    assert rows["cdmTable_visit_occurrence"]["num_violated_rows"] == 1
    assert rows["cdmTable_person"]["num_violated_rows"] == 0
    # NULL gender on one of 5 person rows
    r = rows["isRequired_person_gender_concept_id"]
    assert (r["num_violated_rows"], r["num_denominator_rows"]) == (1, 5)
    assert r["failed"] == 1
    # duplicated person pk: 5 rows, 4 distinct → 1 excess
    assert rows["isPrimaryKey_person_person_id"]["num_violated_rows"] == 1
    # implausible year_of_birth 1800
    assert rows["plausibleValueLow_person_year_of_birth"]["num_violated_rows"] == 1
    # condition end < start once
    assert (
        rows["plausibleStartBeforeEnd_condition_occurrence_condition_start_date"][
            "num_violated_rows"
        ]
        == 1
    )
    # orphan person_id 99
    assert rows["isForeignKey_condition_occurrence_person_id"]["num_violated_rows"] == 1
    # unmapped condition concept (0) on 1 row
    assert (
        rows["standardConceptRecordCompleteness_condition_occurrence_condition_concept_id"][
            "num_violated_rows"
        ]
        == 1
    )
    # condition dated before person 1's birth
    assert (
        rows["plausibleAfterBirth_condition_occurrence_condition_start_date"][
            "num_violated_rows"
        ]
        == 1
    )
    # person 3 died 2020-06-01; condition 23 dated 2020-08-01 (>60d after)
    assert (
        rows["plausibleBeforeDeath_condition_occurrence_condition_start_date"][
            "num_violated_rows"
        ]
        == 1
    )
    # persons without condition rows: 2 and 4 (dup counts once per row → 5-row denom)
    mpc = rows["measurePersonCompleteness_condition_occurrence"]
    assert mpc["num_denominator_rows"] == 5
    assert mpc["num_violated_rows"] == 3  # person 2 + the two pk-4 rows
    # completeness families are informational: threshold 1.0 never fails
    assert mpc["failed"] == 0


def test_within_visit_dates_and_value_completeness(spark):
    visit = spark.createDataFrame(
        [(1, 1, 9201, _d("2020-02-01"), _d("2020-02-10"))],
        "visit_occurrence_id long, person_id long, visit_concept_id long, "
        "visit_start_date date, visit_end_date date",
    )
    measurement = spark.createDataFrame(
        [
            # in-visit, NULL value (value-completeness violation)
            (10, 1, 3027018, _d("2020-02-05"), None, 1),
            # outside the visit window (withinVisitDates violation)
            (11, 1, 3027018, _d("2020-03-01"), 70.0, 1),
            # no visit reference: exempt from withinVisitDates
            (12, 1, 3027018, _d("2021-01-01"), 71.0, None),
        ],
        "measurement_id long, person_id long, measurement_concept_id long, "
        "measurement_date date, value_as_number double, visit_occurrence_id long",
    )
    tables = {"visit_occurrence": visit, "measurement": measurement}
    res = run_sweep(
        spark,
        tables.get,
        cdm54_registry(),
        tables=["visit_occurrence", "measurement"],
        families=["withinVisitDates", "measureValueCompleteness"],
    )
    rows = {r["check_name"]: r for r in res.collect()}
    wv = rows["withinVisitDates_measurement_measurement_date"]
    assert (wv["num_violated_rows"], wv["num_denominator_rows"]) == (1, 3)
    mv = rows["measureValueCompleteness_measurement_value_as_number"]
    assert mv["num_violated_rows"] == 1


def test_fk_domain_and_class_with_concept_table(spark):
    concept = spark.createDataFrame(
        [
            (8507, "Gender", "Gender"),
            (1177480, "Drug", "Ingredient"),
            (19078924, "Drug", "Branded Drug"),  # not Ingredient-level
            (201826, "Condition", "Clinical Finding"),
        ],
        "concept_id long, domain_id string, concept_class_id string",
    )
    drug_era = spark.createDataFrame(
        [
            (1, 1, 1177480, _d("2020-01-01"), _d("2020-02-01")),  # ok
            (2, 1, 19078924, _d("2020-03-01"), _d("2020-04-01")),  # fkClass bad
            (3, 2, 201826, _d("2020-01-01"), _d("2020-01-02")),  # fkDomain bad
        ],
        "drug_era_id long, person_id long, drug_concept_id long, "
        "drug_era_start_date date, drug_era_end_date date",
    )
    tables = {"drug_era": drug_era}
    res = run_sweep(
        spark,
        tables.get,
        cdm54_registry(),
        concept=concept,
        tables=["drug_era"],
        families=["fkDomain", "fkClass"],
    )
    rows = {r["check_name"]: r for r in res.collect()}
    assert rows["fkDomain_drug_era_drug_concept_id"]["num_violated_rows"] == 1
    # both the Branded Drug and the Condition concept violate Ingredient
    assert rows["fkClass_drug_era_drug_concept_id"]["num_violated_rows"] == 2
    assert rows["fkClass_drug_era_drug_concept_id"]["failed"] == 1


def test_duplicate_lookup_keys_do_not_fan_out(spark):
    """A duplicated parent key (the very condition isPrimaryKey flags)
    must not inflate other checks' counts: every lookup projection is
    deduplicated on its join key before the left join."""
    person = spark.createDataFrame(
        [
            # person 1 duplicated — would double every person-1 fact row
            # in the augmented frame without the dedupe
            (1, 8507, 1970, dt.datetime(1970, 3, 1), 8527, 38003563),
            (1, 8507, 1970, dt.datetime(1970, 3, 1), 8527, 38003563),
        ],
        "person_id long, gender_concept_id long, year_of_birth long, "
        "birth_datetime timestamp, race_concept_id long, ethnicity_concept_id long",
    )
    visit = spark.createDataFrame(
        [
            # visit 7 duplicated too
            (7, 1, 9201, _d("2020-02-01"), _d("2020-02-10")),
            (7, 1, 9201, _d("2020-02-01"), _d("2020-02-10")),
        ],
        "visit_occurrence_id long, person_id long, visit_concept_id long, "
        "visit_start_date date, visit_end_date date",
    )
    condition = spark.createDataFrame(
        [
            (20, 1, 201826, _d("2020-02-05"), _d("2020-02-06"), 0, 7),
            (21, 1, None, _d("2020-02-07"), None, 0, 7),  # seeded isRequired hit
            (22, 1, 201826, _d("2020-03-05"), None, 0, 7),  # outside visit
        ],
        "condition_occurrence_id long, person_id long, condition_concept_id long, "
        "condition_start_date date, condition_end_date date, "
        "condition_source_concept_id long, visit_occurrence_id long",
    )
    tables = {
        "person": person,
        "visit_occurrence": visit,
        "condition_occurrence": condition,
    }
    res = run_sweep(
        spark, tables.get, cdm54_registry(), tables=list(tables)
    )
    rows = {r["check_name"]: r for r in res.collect()}
    # the dup parents themselves are still flagged
    assert rows["isPrimaryKey_person_person_id"]["num_violated_rows"] == 1
    assert rows["isPrimaryKey_visit_occurrence_visit_occurrence_id"]["num_violated_rows"] == 1
    # ...but unrelated condition checks keep the true 3-row denominator
    r = rows["isRequired_condition_occurrence_condition_concept_id"]
    assert (r["num_violated_rows"], r["num_denominator_rows"]) == (1, 3)
    fk = rows["isForeignKey_condition_occurrence_person_id"]
    assert (fk["num_violated_rows"], fk["num_denominator_rows"]) == (0, 3)
    wv = rows["withinVisitDates_condition_occurrence_condition_start_date"]
    assert (wv["num_violated_rows"], wv["num_denominator_rows"]) == (1, 3)
    ab = rows["plausibleAfterBirth_condition_occurrence_condition_start_date"]
    assert (ab["num_violated_rows"], ab["num_denominator_rows"]) == (0, 3)


def test_plausible_gender_and_unit_families_auto_enumerate(spark):
    """The two concept-level families (reference data_quality.py:209-217
    drives them from the Concept_Level CSV) enumerate from the built-in
    seed maps: prostate concepts are male-only, pregnancy female-only;
    vital signs carry their UCUM units."""
    person = spark.createDataFrame(
        [
            (1, 8507, 1970, dt.datetime(1970, 3, 1), 8527, 38003563),  # male
            (2, 8532, 1980, dt.datetime(1980, 1, 1), 8527, 38003563),  # female
        ],
        "person_id long, gender_concept_id long, year_of_birth long, "
        "birth_datetime timestamp, race_concept_id long, ethnicity_concept_id long",
    )
    condition = spark.createDataFrame(
        [
            # prostate neoplasm on the female person → violation
            (20, 2, 4163261, _d("2020-02-01")),
            # prostate neoplasm on the male person → fine
            (21, 1, 4163261, _d("2020-02-01")),
            # pregnancy on the male person → violation
            (22, 1, 4299535, _d("2020-03-01")),
            # gender-neutral concept → exempt
            (23, 2, 201826, _d("2020-04-01")),
        ],
        "condition_occurrence_id long, person_id long, "
        "condition_concept_id long, condition_start_date date",
    )
    measurement = spark.createDataFrame(
        [
            # body height in centimeters → fine
            (30, 1, 3036277, _d("2020-02-01"), 8582),
            # body height in kilograms → violation
            (31, 1, 3036277, _d("2020-02-01"), 9529),
            # heart rate, NULL unit → exempt
            (32, 2, 3027018, _d("2020-02-01"), None),
            # concept outside the map → exempt regardless of unit
            (33, 2, 3027114, _d("2020-02-01"), 9529),
        ],
        "measurement_id long, person_id long, measurement_concept_id long, "
        "measurement_date date, unit_concept_id long",
    )
    tables = {
        "person": person,
        "condition_occurrence": condition,
        "measurement": measurement,
    }
    res = run_sweep(
        spark, tables.get, cdm54_registry(), tables=list(tables)
    )
    rows = {r["check_name"]: r for r in res.collect()}
    g = rows["plausibleGenderUseDescendants_condition_occurrence_condition_concept_id"]
    assert (g["num_violated_rows"], g["num_denominator_rows"]) == (2, 4)
    assert g["failed"] == 1  # 50% > 1%
    u = rows["plausibleUnitConceptIds_measurement_measurement_concept_id"]
    assert (u["num_violated_rows"], u["num_denominator_rows"]) == (1, 4)
    # measurement concepts aren't in the gender seed map → 0 violations,
    # but the check itself still enumerates (19/19 families present)
    gm = rows["plausibleGenderUseDescendants_measurement_measurement_concept_id"]
    assert gm["num_violated_rows"] == 0
    fams = {r["check_family"] for r in res.collect()}
    assert {"plausibleGenderUseDescendants", "plausibleUnitConceptIds"} <= fams

    # empty maps disable the families (production opt-out)
    res2 = run_sweep(
        spark, tables.get, cdm54_registry(), tables=list(tables),
        gender_specific={}, allowed_units={},
    )
    fams2 = {r["check_family"] for r in res2.collect()}
    assert "plausibleGenderUseDescendants" not in fams2
    assert "plausibleUnitConceptIds" not in fams2


def test_sweep_threshold_override_and_family_filter(spark, cdm):
    res = run_sweep(
        spark,
        cdm,
        cdm54_registry(),
        families=["isRequired"],
        thresholds={"isRequired_person_gender_concept_id": 0.5},
    )
    rows = {r["check_name"]: r for r in res.collect()}
    assert all(r["check_family"] == "isRequired" for r in rows.values())
    # 1/5 = 0.2 <= 0.5 → passes under the override
    assert rows["isRequired_person_gender_concept_id"]["failed"] == 0
