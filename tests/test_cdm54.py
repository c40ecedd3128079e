"""CDM 5.4 registry: structure, FK toposort, event tables, vocab list."""

from __future__ import annotations

from rabbit_in_a_blender_spark.core.cdm54 import (
    EVENT_TABLES,
    VOCABULARY_TABLES,
    cdm54_registry,
    cdm54_tables,
)


def test_full_table_set():
    names = {t.name for t in cdm54_tables()}
    assert len(names) == 39, sorted(names)
    for t in (
        "person",
        "visit_occurrence",
        "measurement",
        "cost",
        "episode_event",
        "concept",
        "drug_strength",
        "cohort_definition",
    ):
        assert t in names


def test_dependency_levels_respect_fk_order():
    reg = cdm54_registry()
    levels = reg.dependency_levels()
    pos = {t: i for i, level in enumerate(levels) for t in level}
    # parents strictly before children (self-FKs excluded by design)
    for spec in cdm54_tables():
        for fk_col, parent in spec.fks.items():
            if parent != spec.name:
                assert pos[parent] < pos[spec.name], (spec.name, fk_col, parent)
    # the reference's documented fixups hold
    assert pos["note"] < pos["note_nlp"]
    assert pos["payer_plan_period"] < pos["cost"]
    assert pos["person"] == pos["location"] + 1 or pos["person"] > pos["location"]


def test_event_tables_have_discriminators():
    reg = cdm54_registry()
    for t in EVENT_TABLES:
        spec = reg[t]
        assert spec.event_cols, t
        cols = {c.name for c in spec.columns}
        for ev, disc in spec.event_cols.items():
            assert ev in cols and disc in cols, (t, ev, disc)


def test_schemas_build_and_required_flags():
    reg = cdm54_registry()
    person = reg["person"].schema()
    assert not person["person_id"].nullable
    assert person["birth_datetime"].dataType.typeName().startswith("timestamp")
    assert set(VOCABULARY_TABLES) <= {t.name for t in cdm54_tables()}


def test_cdm54_runs_through_pipeline(spark, tmp_path):
    """A mini person+condition ETL through the real CDM 5.4 specs."""
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.pipeline.etl import EtlPipeline, TableInputs
    from rabbit_in_a_blender_spark.pipeline.warehouse import Warehouse

    reg = cdm54_registry()
    person_upload = spark.createDataFrame(
        [("SRC_1", "M", 1980), ("SRC_2", "F", 1990)],
        "person_id string, gender_concept_id__source string, year_of_birth int",
    )
    cond_upload = spark.createDataFrame(
        [("C_1", "SRC_1", "ICD_X"), ("C_2", "SRC_2", "ICD_Y")],
        "condition_occurrence_id string, person_id string, "
        "condition_concept_id__source string",
    )
    usagi_g = spark.createDataFrame(
        [("M", "male", "APPROVED", 8507, "MALE", "Gender"),
         ("F", "female", "APPROVED", 8532, "FEMALE", "Gender")],
        "sourceCode string, sourceName string, mappingStatus string, "
        "conceptId long, conceptName string, domainId string",
    )
    pipe = EtlPipeline(spark, Warehouse(str(tmp_path / "wh")), reg)
    pipe.run_table(
        reg["person"],
        TableInputs(uploads=[person_upload], usagi={"gender_concept_id": usagi_g}),
    )
    pipe.run_table(reg["condition_occurrence"], TableInputs(uploads=[cond_upload]))

    person = pipe.wh.read(spark, "omop", "person")
    cond = pipe.wh.read(spark, "omop", "condition_occurrence")
    assert person.count() == 2
    assert cond.count() == 2
    # FK remapped to the generated person ids
    pids = {r["person_id"] for r in person.collect()}
    assert {r["person_id"] for r in cond.collect()} <= pids


def test_clustering_fields_attached_and_written_sorted(spark, tmp_path):
    """Every CDM table carries the reference's CLUSTER BY keys
    (bq:ddl/OMOPCDM_bigquery_5.4_clustering_fields.json); Warehouse.write
    range-partitions + sorts on them so rowgroup stats prune scans."""
    from pyspark.sql import functions as F

    from rabbit_in_a_blender_spark.core.cdm54 import cdm54_registry
    from rabbit_in_a_blender_spark.pipeline.warehouse import Warehouse

    reg = cdm54_registry()
    assert reg["person"].cluster_by == [
        "gender_concept_id", "location_id", "race_concept_id", "person_id"
    ]
    assert reg["measurement"].cluster_by[0] == "measurement_concept_id"
    assert all(spec.cluster_by for spec in reg.tables.values())

    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("gender_concept_id"),
        (F.col("id") % 13).alias("location_id"),
        (F.col("id") % 3).alias("race_concept_id"),
        F.col("id").alias("person_id"),
    )
    wh.write(df, "omop", "person", cluster_by=reg["person"].cluster_by)
    back = wh.read(spark, "omop", "person")
    assert back.count() == 10000
    # within every output file, rows are sorted on the cluster keys
    files = back.select(
        F.input_file_name().alias("f"), "gender_concept_id", "location_id",
        "race_concept_id", "person_id"
    )
    # each file must cover a narrow leading-key range (range partitioning
    # + in-file sort); boundary overlap of one key value is allowed
    per_file = files.groupBy("f").agg(
        F.min("gender_concept_id").alias("lo"), F.max("gender_concept_id").alias("hi")
    ).collect()
    # range partitioning: files cover narrow, mostly disjoint leading-key
    # ranges (allow boundary overlap of 1 key value)
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert lo2 >= hi1 - 1, spans
