"""OMOP CDM v5.4 schema registry — the 39-table metadata set the
reference loads from the OHDSI CDM CSVs at startup (etl/etl_base.py:55-142,
submodule CommonDataModel v5.4.1; the table/field lists are public OHDSI
knowledge: https://ohdsi.github.io/CommonDataModel/cdm54.html).

Encodes per table: columns (name, type, required), primary key, FK →
parent-table routing (including the reference's special cases:
``preceding_visit_occurrence_id → visit_occurrence``,
``parent_visit_detail_id → visit_detail``, ``episode_parent_id →
episode``, NOTE_NLP → NOTE, COST → PAYER_PLAN_PERIOD — reference
etl/etl_base.py:107-132 and {omop_table}_merge.sql.jinja:96-112),
concept columns (usagi-mapped ``*_concept_id``), and polymorphic event
columns with their ``*_field_concept_id`` discriminators
(etl/cdm_5.4_events.json:1-23).

``cdm54_registry()`` returns a SchemaRegistry ready for EtlPipeline; the
FK toposort then reproduces the reference's dependency levels.
"""

from __future__ import annotations

from .registry import ColumnSpec, SchemaRegistry, TableSpec

_I = "int64"
_F = "float64"
_S = "string"
_D = "date"
_T = "datetime"


def _c(name: str, dtype: str = _S, req: bool = False) -> ColumnSpec:
    return ColumnSpec(name, dtype, required=req)


def _person() -> TableSpec:
    return TableSpec(
        name="person",
        pk="person_id",
        concept_cols=[
            "gender_concept_id",
            "race_concept_id",
            "ethnicity_concept_id",
        ],
        fks={
            "location_id": "location",
            "provider_id": "provider",
            "care_site_id": "care_site",
        },
        columns=[
            _c("person_id", _I, True),
            _c("gender_concept_id", _I, True),
            _c("year_of_birth", _I, True),
            _c("month_of_birth", _I),
            _c("day_of_birth", _I),
            _c("birth_datetime", _T),
            _c("race_concept_id", _I, True),
            _c("ethnicity_concept_id", _I, True),
            _c("location_id", _I),
            _c("provider_id", _I),
            _c("care_site_id", _I),
            _c("person_source_value", _S),
            _c("gender_source_value", _S),
            _c("gender_source_concept_id", _I),
            _c("race_source_value", _S),
            _c("race_source_concept_id", _I),
            _c("ethnicity_source_value", _S),
            _c("ethnicity_source_concept_id", _I),
        ],
    )


def _observation_period() -> TableSpec:
    return TableSpec(
        name="observation_period",
        pk="observation_period_id",
        concept_cols=["period_type_concept_id"],
        fks={"person_id": "person"},
        columns=[
            _c("observation_period_id", _I, True),
            _c("person_id", _I, True),
            _c("observation_period_start_date", _D, True),
            _c("observation_period_end_date", _D, True),
            _c("period_type_concept_id", _I, True),
        ],
    )


def _visit_occurrence() -> TableSpec:
    return TableSpec(
        name="visit_occurrence",
        pk="visit_occurrence_id",
        concept_cols=[
            "visit_concept_id",
            "visit_type_concept_id",
            "visit_source_concept_id",
            "admitted_from_concept_id",
            "discharged_to_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "care_site_id": "care_site",
            "preceding_visit_occurrence_id": "visit_occurrence",
        },
        columns=[
            _c("visit_occurrence_id", _I, True),
            _c("person_id", _I, True),
            _c("visit_concept_id", _I, True),
            _c("visit_start_date", _D, True),
            _c("visit_start_datetime", _T),
            _c("visit_end_date", _D, True),
            _c("visit_end_datetime", _T),
            _c("visit_type_concept_id", _I, True),
            _c("provider_id", _I),
            _c("care_site_id", _I),
            _c("visit_source_value", _S),
            _c("visit_source_concept_id", _I),
            _c("admitted_from_concept_id", _I),
            _c("admitted_from_source_value", _S),
            _c("discharged_to_concept_id", _I),
            _c("discharged_to_source_value", _S),
            _c("preceding_visit_occurrence_id", _I),
        ],
    )


def _visit_detail() -> TableSpec:
    return TableSpec(
        name="visit_detail",
        pk="visit_detail_id",
        concept_cols=[
            "visit_detail_concept_id",
            "visit_detail_type_concept_id",
            "visit_detail_source_concept_id",
            "admitted_from_concept_id",
            "discharged_to_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "care_site_id": "care_site",
            "preceding_visit_detail_id": "visit_detail",
            "parent_visit_detail_id": "visit_detail",
            "visit_occurrence_id": "visit_occurrence",
        },
        columns=[
            _c("visit_detail_id", _I, True),
            _c("person_id", _I, True),
            _c("visit_detail_concept_id", _I, True),
            _c("visit_detail_start_date", _D, True),
            _c("visit_detail_start_datetime", _T),
            _c("visit_detail_end_date", _D, True),
            _c("visit_detail_end_datetime", _T),
            _c("visit_detail_type_concept_id", _I, True),
            _c("provider_id", _I),
            _c("care_site_id", _I),
            _c("visit_detail_source_value", _S),
            _c("visit_detail_source_concept_id", _I),
            _c("admitted_from_concept_id", _I),
            _c("admitted_from_source_value", _S),
            _c("discharged_to_source_value", _S),
            _c("discharged_to_concept_id", _I),
            _c("preceding_visit_detail_id", _I),
            _c("parent_visit_detail_id", _I),
            _c("visit_occurrence_id", _I, True),
        ],
    )


def _condition_occurrence() -> TableSpec:
    return TableSpec(
        name="condition_occurrence",
        pk="condition_occurrence_id",
        concept_cols=[
            "condition_concept_id",
            "condition_type_concept_id",
            "condition_status_concept_id",
            "condition_source_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        columns=[
            _c("condition_occurrence_id", _I, True),
            _c("person_id", _I, True),
            _c("condition_concept_id", _I, True),
            _c("condition_start_date", _D, True),
            _c("condition_start_datetime", _T),
            _c("condition_end_date", _D),
            _c("condition_end_datetime", _T),
            _c("condition_type_concept_id", _I, True),
            _c("condition_status_concept_id", _I),
            _c("stop_reason", _S),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("condition_source_value", _S),
            _c("condition_source_concept_id", _I),
            _c("condition_status_source_value", _S),
        ],
    )


def _drug_exposure() -> TableSpec:
    return TableSpec(
        name="drug_exposure",
        pk="drug_exposure_id",
        concept_cols=[
            "drug_concept_id",
            "drug_type_concept_id",
            "route_concept_id",
            "drug_source_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        columns=[
            _c("drug_exposure_id", _I, True),
            _c("person_id", _I, True),
            _c("drug_concept_id", _I, True),
            _c("drug_exposure_start_date", _D, True),
            _c("drug_exposure_start_datetime", _T),
            _c("drug_exposure_end_date", _D, True),
            _c("drug_exposure_end_datetime", _T),
            _c("verbatim_end_date", _D),
            _c("drug_type_concept_id", _I, True),
            _c("stop_reason", _S),
            _c("refills", _I),
            _c("quantity", _F),
            _c("days_supply", _I),
            _c("sig", _S),
            _c("route_concept_id", _I),
            _c("lot_number", _S),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("drug_source_value", _S),
            _c("drug_source_concept_id", _I),
            _c("route_source_value", _S),
            _c("dose_unit_source_value", _S),
        ],
    )


def _procedure_occurrence() -> TableSpec:
    return TableSpec(
        name="procedure_occurrence",
        pk="procedure_occurrence_id",
        concept_cols=[
            "procedure_concept_id",
            "procedure_type_concept_id",
            "modifier_concept_id",
            "procedure_source_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        columns=[
            _c("procedure_occurrence_id", _I, True),
            _c("person_id", _I, True),
            _c("procedure_concept_id", _I, True),
            _c("procedure_date", _D, True),
            _c("procedure_datetime", _T),
            _c("procedure_end_date", _D),
            _c("procedure_end_datetime", _T),
            _c("procedure_type_concept_id", _I, True),
            _c("modifier_concept_id", _I),
            _c("quantity", _I),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("procedure_source_value", _S),
            _c("procedure_source_concept_id", _I),
            _c("modifier_source_value", _S),
        ],
    )


def _device_exposure() -> TableSpec:
    return TableSpec(
        name="device_exposure",
        pk="device_exposure_id",
        concept_cols=[
            "device_concept_id",
            "device_type_concept_id",
            "device_source_concept_id",
            "unit_concept_id",
            "unit_source_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        columns=[
            _c("device_exposure_id", _I, True),
            _c("person_id", _I, True),
            _c("device_concept_id", _I, True),
            _c("device_exposure_start_date", _D, True),
            _c("device_exposure_start_datetime", _T),
            _c("device_exposure_end_date", _D),
            _c("device_exposure_end_datetime", _T),
            _c("device_type_concept_id", _I, True),
            _c("unique_device_id", _S),
            _c("production_id", _S),
            _c("quantity", _I),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("device_source_value", _S),
            _c("device_source_concept_id", _I),
            _c("unit_concept_id", _I),
            _c("unit_source_value", _S),
            _c("unit_source_concept_id", _I),
        ],
    )


def _measurement() -> TableSpec:
    return TableSpec(
        name="measurement",
        pk="measurement_id",
        concept_cols=[
            "measurement_concept_id",
            "measurement_type_concept_id",
            "operator_concept_id",
            "value_as_concept_id",
            "unit_concept_id",
            "measurement_source_concept_id",
            "unit_source_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        event_cols={"measurement_event_id": "meas_event_field_concept_id"},
        columns=[
            _c("measurement_id", _I, True),
            _c("person_id", _I, True),
            _c("measurement_concept_id", _I, True),
            _c("measurement_date", _D, True),
            _c("measurement_datetime", _T),
            _c("measurement_time", _S),
            _c("measurement_type_concept_id", _I, True),
            _c("operator_concept_id", _I),
            _c("value_as_number", _F),
            _c("value_as_concept_id", _I),
            _c("unit_concept_id", _I),
            _c("range_low", _F),
            _c("range_high", _F),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("measurement_source_value", _S),
            _c("measurement_source_concept_id", _I),
            _c("unit_source_value", _S),
            _c("unit_source_concept_id", _I),
            _c("value_source_value", _S),
            _c("measurement_event_id", _I),
            _c("meas_event_field_concept_id", _I),
        ],
    )


def _observation() -> TableSpec:
    return TableSpec(
        name="observation",
        pk="observation_id",
        concept_cols=[
            "observation_concept_id",
            "observation_type_concept_id",
            "value_as_concept_id",
            "qualifier_concept_id",
            "unit_concept_id",
            "observation_source_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        event_cols={"observation_event_id": "obs_event_field_concept_id"},
        columns=[
            _c("observation_id", _I, True),
            _c("person_id", _I, True),
            _c("observation_concept_id", _I, True),
            _c("observation_date", _D, True),
            _c("observation_datetime", _T),
            _c("observation_type_concept_id", _I, True),
            _c("value_as_number", _F),
            _c("value_as_string", _S),
            _c("value_as_concept_id", _I),
            _c("qualifier_concept_id", _I),
            _c("unit_concept_id", _I),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("observation_source_value", _S),
            _c("observation_source_concept_id", _I),
            _c("unit_source_value", _S),
            _c("qualifier_source_value", _S),
            _c("value_source_value", _S),
            _c("observation_event_id", _I),
            _c("obs_event_field_concept_id", _I),
        ],
    )


def _death() -> TableSpec:
    return TableSpec(
        name="death",
        pk=None,  # dedup key is person_id (reference merge_check special case)
        concept_cols=["death_type_concept_id", "cause_concept_id", "cause_source_concept_id"],
        fks={"person_id": "person"},
        columns=[
            _c("person_id", _I, True),
            _c("death_date", _D, True),
            _c("death_datetime", _T),
            _c("death_type_concept_id", _I),
            _c("cause_concept_id", _I),
            _c("cause_source_value", _S),
            _c("cause_source_concept_id", _I),
        ],
    )


def _note() -> TableSpec:
    return TableSpec(
        name="note",
        pk="note_id",
        concept_cols=[
            "note_type_concept_id",
            "note_class_concept_id",
            "encoding_concept_id",
            "language_concept_id",
        ],
        fks={
            "person_id": "person",
            "provider_id": "provider",
            "visit_occurrence_id": "visit_occurrence",
            "visit_detail_id": "visit_detail",
        },
        event_cols={"note_event_id": "note_event_field_concept_id"},
        columns=[
            _c("note_id", _I, True),
            _c("person_id", _I, True),
            _c("note_date", _D, True),
            _c("note_datetime", _T),
            _c("note_type_concept_id", _I, True),
            _c("note_class_concept_id", _I, True),
            _c("note_title", _S),
            _c("note_text", _S, True),
            _c("encoding_concept_id", _I, True),
            _c("language_concept_id", _I, True),
            _c("provider_id", _I),
            _c("visit_occurrence_id", _I),
            _c("visit_detail_id", _I),
            _c("note_source_value", _S),
            _c("note_event_id", _I),
            _c("note_event_field_concept_id", _I),
        ],
    )


def _note_nlp() -> TableSpec:
    return TableSpec(
        name="note_nlp",
        pk="note_nlp_id",
        concept_cols=["section_concept_id", "note_nlp_concept_id", "note_nlp_source_concept_id"],
        fks={"note_id": "note"},  # reference graph fixup: NOTE_NLP → NOTE
        columns=[
            _c("note_nlp_id", _I, True),
            _c("note_id", _I, True),
            _c("section_concept_id", _I),
            _c("snippet", _S),
            _c("offset", _S),
            _c("lexical_variant", _S, True),
            _c("note_nlp_concept_id", _I),
            _c("note_nlp_source_concept_id", _I),
            _c("nlp_system", _S),
            _c("nlp_date", _D, True),
            _c("nlp_datetime", _T),
            _c("term_exists", _S),
            _c("term_temporal", _S),
            _c("term_modifiers", _S),
        ],
    )


def _specimen() -> TableSpec:
    return TableSpec(
        name="specimen",
        pk="specimen_id",
        concept_cols=[
            "specimen_concept_id",
            "specimen_type_concept_id",
            "unit_concept_id",
            "anatomic_site_concept_id",
            "disease_status_concept_id",
        ],
        fks={"person_id": "person"},
        columns=[
            _c("specimen_id", _I, True),
            _c("person_id", _I, True),
            _c("specimen_concept_id", _I, True),
            _c("specimen_type_concept_id", _I, True),
            _c("specimen_date", _D, True),
            _c("specimen_datetime", _T),
            _c("quantity", _F),
            _c("unit_concept_id", _I),
            _c("anatomic_site_concept_id", _I),
            _c("disease_status_concept_id", _I),
            _c("specimen_source_id", _S),
            _c("specimen_source_value", _S),
            _c("unit_source_value", _S),
            _c("anatomic_site_source_value", _S),
            _c("disease_status_source_value", _S),
        ],
    )


def _fact_relationship() -> TableSpec:
    return TableSpec(
        name="fact_relationship",
        pk=None,  # dedup key is (fact_id_1, fact_id_2) per reference
        concept_cols=["relationship_concept_id"],
        event_cols={
            "fact_id_1": "domain_concept_id_1",
            "fact_id_2": "domain_concept_id_2",
        },
        columns=[
            _c("domain_concept_id_1", _I, True),
            _c("fact_id_1", _I, True),
            _c("domain_concept_id_2", _I, True),
            _c("fact_id_2", _I, True),
            _c("relationship_concept_id", _I, True),
        ],
    )


def _episode() -> TableSpec:
    return TableSpec(
        name="episode",
        pk="episode_id",
        concept_cols=[
            "episode_concept_id",
            "episode_object_concept_id",
            "episode_type_concept_id",
            "episode_source_concept_id",
        ],
        fks={"person_id": "person", "episode_parent_id": "episode"},  # self-FK
        columns=[
            _c("episode_id", _I, True),
            _c("person_id", _I, True),
            _c("episode_concept_id", _I, True),
            _c("episode_start_date", _D, True),
            _c("episode_start_datetime", _T),
            _c("episode_end_date", _D),
            _c("episode_end_datetime", _T),
            _c("episode_parent_id", _I),
            _c("episode_number", _I),
            _c("episode_object_concept_id", _I, True),
            _c("episode_type_concept_id", _I, True),
            _c("episode_source_value", _S),
            _c("episode_source_concept_id", _I),
        ],
    )


def _episode_event() -> TableSpec:
    return TableSpec(
        name="episode_event",
        pk=None,  # dedup key is episode_id per reference merge_check
        concept_cols=["episode_event_field_concept_id"],
        fks={"episode_id": "episode"},
        event_cols={"event_id": "episode_event_field_concept_id"},
        columns=[
            _c("episode_id", _I, True),
            _c("event_id", _I, True),
            _c("episode_event_field_concept_id", _I, True),
        ],
    )


def _location() -> TableSpec:
    return TableSpec(
        name="location",
        pk="location_id",
        concept_cols=["country_concept_id"],
        columns=[
            _c("location_id", _I, True),
            _c("address_1", _S),
            _c("address_2", _S),
            _c("city", _S),
            _c("state", _S),
            _c("zip", _S),
            _c("county", _S),
            _c("location_source_value", _S),
            _c("country_concept_id", _I),
            _c("country_source_value", _S),
            _c("latitude", _F),
            _c("longitude", _F),
        ],
    )


def _care_site() -> TableSpec:
    return TableSpec(
        name="care_site",
        pk="care_site_id",
        concept_cols=["place_of_service_concept_id"],
        fks={"location_id": "location"},
        columns=[
            _c("care_site_id", _I, True),
            _c("care_site_name", _S),
            _c("place_of_service_concept_id", _I),
            _c("location_id", _I),
            _c("care_site_source_value", _S),
            _c("place_of_service_source_value", _S),
        ],
    )


def _provider() -> TableSpec:
    return TableSpec(
        name="provider",
        pk="provider_id",
        concept_cols=["specialty_concept_id", "gender_concept_id", "specialty_source_concept_id", "gender_source_concept_id"],
        fks={"care_site_id": "care_site"},
        columns=[
            _c("provider_id", _I, True),
            _c("provider_name", _S),
            _c("npi", _S),
            _c("dea", _S),
            _c("specialty_concept_id", _I),
            _c("care_site_id", _I),
            _c("year_of_birth", _I),
            _c("gender_concept_id", _I),
            _c("provider_source_value", _S),
            _c("specialty_source_value", _S),
            _c("specialty_source_concept_id", _I),
            _c("gender_source_value", _S),
            _c("gender_source_concept_id", _I),
        ],
    )


def _payer_plan_period() -> TableSpec:
    return TableSpec(
        name="payer_plan_period",
        pk="payer_plan_period_id",
        concept_cols=[
            "payer_concept_id",
            "payer_source_concept_id",
            "plan_concept_id",
            "plan_source_concept_id",
            "sponsor_concept_id",
            "sponsor_source_concept_id",
            "stop_reason_concept_id",
            "stop_reason_source_concept_id",
        ],
        fks={"person_id": "person"},
        columns=[
            _c("payer_plan_period_id", _I, True),
            _c("person_id", _I, True),
            _c("payer_plan_period_start_date", _D, True),
            _c("payer_plan_period_end_date", _D, True),
            _c("payer_concept_id", _I),
            _c("payer_source_value", _S),
            _c("payer_source_concept_id", _I),
            _c("plan_concept_id", _I),
            _c("plan_source_value", _S),
            _c("plan_source_concept_id", _I),
            _c("sponsor_concept_id", _I),
            _c("sponsor_source_value", _S),
            _c("sponsor_source_concept_id", _I),
            _c("family_source_value", _S),
            _c("stop_reason_concept_id", _I),
            _c("stop_reason_source_value", _S),
            _c("stop_reason_source_concept_id", _I),
        ],
    )


def _cost() -> TableSpec:
    return TableSpec(
        name="cost",
        pk="cost_id",
        concept_cols=[
            "cost_type_concept_id",
            "currency_concept_id",
            "revenue_code_concept_id",
            "drg_concept_id",
        ],
        # reference graph fixup: COST → PAYER_PLAN_PERIOD
        fks={"payer_plan_period_id": "payer_plan_period"},
        # Reference parity: cdm_5.4_events.json routes cost_event_id by
        # cost_type_concept_id (not cost_domain_id, which would be the
        # CDM-truer discriminator) — match the upstream framework.
        event_cols={"cost_event_id": "cost_type_concept_id"},
        columns=[
            _c("cost_id", _I, True),
            _c("cost_event_id", _I, True),
            _c("cost_domain_id", _S, True),
            _c("cost_type_concept_id", _I, True),
            _c("currency_concept_id", _I),
            _c("total_charge", _F),
            _c("total_cost", _F),
            _c("total_paid", _F),
            _c("paid_by_payer", _F),
            _c("paid_by_patient", _F),
            _c("paid_patient_copay", _F),
            _c("paid_patient_coinsurance", _F),
            _c("paid_patient_deductible", _F),
            _c("paid_by_primary", _F),
            _c("paid_ingredient_cost", _F),
            _c("paid_dispensing_fee", _F),
            _c("payer_plan_period_id", _I),
            _c("amount_allowed", _F),
            _c("revenue_code_concept_id", _I),
            _c("revenue_code_source_value", _S),
            _c("drg_concept_id", _I),
            _c("drg_source_value", _S),
        ],
    )


def _eras() -> list[TableSpec]:
    return [
        TableSpec(
            name="drug_era",
            pk="drug_era_id",
            concept_cols=["drug_concept_id"],
            # reference adds ERA → occurrence-table ordering edges
            fks={"person_id": "person"},
            columns=[
                _c("drug_era_id", _I, True),
                _c("person_id", _I, True),
                _c("drug_concept_id", _I, True),
                _c("drug_era_start_date", _D, True),
                _c("drug_era_end_date", _D, True),
                _c("drug_exposure_count", _I),
                _c("gap_days", _I),
            ],
        ),
        TableSpec(
            name="dose_era",
            pk="dose_era_id",
            concept_cols=["drug_concept_id", "unit_concept_id"],
            fks={"person_id": "person"},
            columns=[
                _c("dose_era_id", _I, True),
                _c("person_id", _I, True),
                _c("drug_concept_id", _I, True),
                _c("unit_concept_id", _I, True),
                _c("dose_value", _F, True),
                _c("dose_era_start_date", _D, True),
                _c("dose_era_end_date", _D, True),
            ],
        ),
        TableSpec(
            name="condition_era",
            pk="condition_era_id",
            concept_cols=["condition_concept_id"],
            fks={"person_id": "person"},
            columns=[
                _c("condition_era_id", _I, True),
                _c("person_id", _I, True),
                _c("condition_concept_id", _I, True),
                _c("condition_era_start_date", _D, True),
                _c("condition_era_end_date", _D, True),
                _c("condition_occurrence_count", _I),
            ],
        ),
    ]


def _metadata_tables() -> list[TableSpec]:
    return [
        TableSpec(
            name="cdm_source",
            pk=None,  # dedup key cdm_source_name per reference merge_check
            concept_cols=["cdm_version_concept_id"],
            columns=[
                _c("cdm_source_name", _S, True),
                _c("cdm_source_abbreviation", _S, True),
                _c("cdm_holder", _S, True),
                _c("source_description", _S),
                _c("source_documentation_reference", _S),
                _c("cdm_etl_reference", _S),
                _c("source_release_date", _D, True),
                _c("cdm_release_date", _D, True),
                _c("cdm_version", _S),
                _c("cdm_version_concept_id", _I, True),
                _c("vocabulary_version", _S, True),
            ],
        ),
        TableSpec(
            name="metadata",
            pk="metadata_id",
            concept_cols=["metadata_concept_id", "metadata_type_concept_id", "value_as_concept_id"],
            columns=[
                _c("metadata_id", _I, True),
                _c("metadata_concept_id", _I, True),
                _c("metadata_type_concept_id", _I, True),
                _c("name", _S, True),
                _c("value_as_string", _S),
                _c("value_as_concept_id", _I),
                _c("value_as_number", _F),
                _c("metadata_date", _D),
                _c("metadata_datetime", _T),
            ],
        ),
    ]


def _vocab_tables() -> list[TableSpec]:
    return [
        TableSpec(
            name="concept",
            pk="concept_id",
            columns=[
                _c("concept_id", _I, True),
                _c("concept_name", _S, True),
                _c("domain_id", _S, True),
                _c("vocabulary_id", _S, True),
                _c("concept_class_id", _S, True),
                _c("standard_concept", _S),
                _c("concept_code", _S, True),
                _c("valid_start_date", _D, True),
                _c("valid_end_date", _D, True),
                _c("invalid_reason", _S),
            ],
        ),
        TableSpec(
            name="vocabulary",
            pk="vocabulary_id",
            columns=[
                _c("vocabulary_id", _S, True),
                _c("vocabulary_name", _S, True),
                _c("vocabulary_reference", _S),
                _c("vocabulary_version", _S),
                _c("vocabulary_concept_id", _I, True),
            ],
        ),
        TableSpec(
            name="domain",
            pk="domain_id",
            columns=[
                _c("domain_id", _S, True),
                _c("domain_name", _S, True),
                _c("domain_concept_id", _I, True),
            ],
        ),
        TableSpec(
            name="concept_class",
            pk="concept_class_id",
            columns=[
                _c("concept_class_id", _S, True),
                _c("concept_class_name", _S, True),
                _c("concept_class_concept_id", _I, True),
            ],
        ),
        TableSpec(
            name="concept_relationship",
            pk=None,
            columns=[
                _c("concept_id_1", _I, True),
                _c("concept_id_2", _I, True),
                _c("relationship_id", _S, True),
                _c("valid_start_date", _D, True),
                _c("valid_end_date", _D, True),
                _c("invalid_reason", _S),
            ],
        ),
        TableSpec(
            name="relationship",
            pk="relationship_id",
            columns=[
                _c("relationship_id", _S, True),
                _c("relationship_name", _S, True),
                _c("is_hierarchical", _S, True),
                _c("defines_ancestry", _S, True),
                _c("reverse_relationship_id", _S, True),
                _c("relationship_concept_id", _I, True),
            ],
        ),
        TableSpec(
            name="concept_synonym",
            pk=None,
            columns=[
                _c("concept_id", _I, True),
                _c("concept_synonym_name", _S, True),
                _c("language_concept_id", _I, True),
            ],
        ),
        TableSpec(
            name="concept_ancestor",
            pk=None,
            columns=[
                _c("ancestor_concept_id", _I, True),
                _c("descendant_concept_id", _I, True),
                _c("min_levels_of_separation", _I, True),
                _c("max_levels_of_separation", _I, True),
            ],
        ),
        TableSpec(
            name="source_to_concept_map",
            pk=None,
            columns=[
                _c("source_code", _S, True),
                _c("source_concept_id", _I, True),
                _c("source_vocabulary_id", _S, True),
                _c("source_code_description", _S),
                _c("target_concept_id", _I, True),
                _c("target_vocabulary_id", _S, True),
                _c("valid_start_date", _D, True),
                _c("valid_end_date", _D, True),
                _c("invalid_reason", _S),
            ],
        ),
        TableSpec(
            name="drug_strength",
            pk=None,
            columns=[
                _c("drug_concept_id", _I, True),
                _c("ingredient_concept_id", _I, True),
                _c("amount_value", _F),
                _c("amount_unit_concept_id", _I),
                _c("numerator_value", _F),
                _c("numerator_unit_concept_id", _I),
                _c("denominator_value", _F),
                _c("denominator_unit_concept_id", _I),
                _c("box_size", _I),
                _c("valid_start_date", _D, True),
                _c("valid_end_date", _D, True),
                _c("invalid_reason", _S),
            ],
        ),
    ]


def _results_tables() -> list[TableSpec]:
    return [
        TableSpec(
            name="cohort",
            pk=None,
            columns=[
                _c("cohort_definition_id", _I, True),
                _c("subject_id", _I, True),
                _c("cohort_start_date", _D, True),
                _c("cohort_end_date", _D, True),
            ],
        ),
        TableSpec(
            name="cohort_definition",
            pk=None,
            columns=[
                _c("cohort_definition_id", _I, True),
                _c("cohort_definition_name", _S, True),
                _c("cohort_definition_description", _S),
                _c("definition_type_concept_id", _I, True),
                _c("cohort_definition_syntax", _S),
                _c("subject_concept_id", _I, True),
                _c("cohort_initiation_date", _D),
            ],
        ),
    ]


# The 9 vocabulary tables imported by --import-vocabularies
# (etl/import_vocabularies.py:40-121)
VOCABULARY_TABLES = (
    "concept",
    "vocabulary",
    "domain",
    "concept_class",
    "concept_relationship",
    "relationship",
    "concept_synonym",
    "concept_ancestor",
    "drug_strength",
)

# The 6 tables with polymorphic *_event_id columns (cdm_5.4_events.json)
EVENT_TABLES = (
    "measurement",
    "observation",
    "note",
    "cost",
    "episode_event",
    "fact_relationship",
)


# Per-table clustering keys — the reference's BigQuery CLUSTER BY fields
# (bq:ddl/OMOPCDM_bigquery_5.4_clustering_fields.json, loaded at
# etl/bigquery/etl_base.py:69-88).  On Spark these become range-partition
# + sort keys on final writes (Warehouse.write cluster_by) so parquet
# rowgroup min/max stats prune reads on the same predicates BigQuery
# clustering serves.
CLUSTERING_FIELDS: dict[str, list[str]] = {
    "person": ["gender_concept_id", "location_id", "race_concept_id", "person_id"],
    "observation_period": ["person_id", "period_type_concept_id", "observation_period_id"],
    "visit_occurrence": ["visit_concept_id", "provider_id", "person_id", "visit_occurrence_id"],
    "visit_detail": ["visit_detail_concept_id", "provider_id", "person_id", "visit_detail_id"],
    "condition_occurrence": ["condition_concept_id", "provider_id", "person_id", "condition_occurrence_id"],
    "drug_exposure": ["drug_concept_id", "provider_id", "person_id", "drug_exposure_id"],
    "procedure_occurrence": ["procedure_concept_id", "provider_id", "person_id", "procedure_occurrence_id"],
    "device_exposure": ["device_concept_id", "provider_id", "person_id", "device_exposure_id"],
    "measurement": ["measurement_concept_id", "provider_id", "person_id", "measurement_id"],
    "observation": ["observation_concept_id", "provider_id", "person_id", "observation_id"],
    "death": ["death_type_concept_id", "cause_concept_id", "person_id"],
    "note": ["provider_id", "person_id", "note_type_concept_id", "note_id"],
    "note_nlp": ["nlp_system", "note_id", "note_nlp_id"],
    "specimen": ["specimen_concept_id", "anatomic_site_concept_id", "person_id", "specimen_id"],
    "fact_relationship": ["relationship_concept_id", "domain_concept_id_1", "domain_concept_id_2"],
    "location": ["country_concept_id", "zip", "location_id"],
    "care_site": ["place_of_service_concept_id", "location_id", "care_site_id"],
    "provider": ["specialty_concept_id", "care_site_id", "gender_concept_id", "provider_id"],
    "payer_plan_period": ["plan_concept_id", "person_id", "payer_plan_period_id"],
    "cost": ["drg_concept_id", "revenue_code_concept_id", "cost_event_id", "cost_id"],
    "drug_era": ["drug_concept_id", "person_id", "drug_era_id"],
    "dose_era": ["drug_concept_id", "person_id", "dose_era_id"],
    "condition_era": ["condition_concept_id", "person_id", "condition_era_id"],
    "episode": ["episode_concept_id", "person_id", "episode_id"],
    "episode_event": ["episode_event_field_concept_id", "event_id", "episode_id"],
    "metadata": ["metadata_type_concept_id", "metadata_concept_id"],
    "cdm_source": ["cdm_source_name"],
    "concept": ["standard_concept", "vocabulary_id", "domain_id", "concept_id"],
    "vocabulary": ["vocabulary_concept_id", "vocabulary_id"],
    "domain": ["domain_concept_id", "domain_id"],
    "concept_class": ["concept_class_concept_id", "concept_class_id"],
    "concept_relationship": ["relationship_id", "concept_id_2", "concept_id_1"],
    "relationship": ["relationship_concept_id", "reverse_relationship_id", "relationship_id"],
    "concept_synonym": ["concept_id"],
    "concept_ancestor": ["descendant_concept_id", "ancestor_concept_id"],
    "source_to_concept_map": ["source_vocabulary_id", "target_vocabulary_id"],
    "drug_strength": ["ingredient_concept_id", "drug_concept_id"],
    "cohort": ["subject_id", "cohort_definition_id"],
    "cohort_definition": ["subject_concept_id", "definition_type_concept_id", "cohort_definition_id"],
}


def cdm54_tables() -> list[TableSpec]:
    specs = [
        _person(),
        _observation_period(),
        _visit_occurrence(),
        _visit_detail(),
        _condition_occurrence(),
        _drug_exposure(),
        _procedure_occurrence(),
        _device_exposure(),
        _measurement(),
        _observation(),
        _death(),
        _note(),
        _note_nlp(),
        _specimen(),
        _fact_relationship(),
        _episode(),
        _episode_event(),
        _location(),
        _care_site(),
        _provider(),
        _payer_plan_period(),
        _cost(),
        *_eras(),
        *_metadata_tables(),
        *_vocab_tables(),
        *_results_tables(),
    ]
    for spec in specs:
        spec.cluster_by = CLUSTERING_FIELDS.get(spec.name, [])
    return specs


def cdm54_registry() -> SchemaRegistry:
    """The full CDM 5.4 registry, FK graph ready for dependency_levels()."""
    return SchemaRegistry(cdm54_tables())


def vocabulary_schemas():
    """StructType per vocabulary table, for --import-vocabularies
    (the reference derives these from the CDM metadata CSVs the same
    way, etl/import_vocabularies.py:164-185)."""
    reg = cdm54_registry()
    return {t: reg[t].schema() for t in VOCABULARY_TABLES if t in reg}
