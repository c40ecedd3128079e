"""DQD dashboard export: the OHDSI DQD web-viewer JSON contract.

The reference emits a JSON document the public DataQualityDashboard
viewer renders (/root/reference/src/riab/etl/data_quality.py:136-173:
startTimestamp/endTimestamp/executionTime + Overview + Metadata +
CheckResults with UPPERCASE field names and null terms dropped; Overview
keys :301-318; Kahn category rollups :288-299; dashboard prep
data_quality_dashboard.py:380-545).  ``export_dqd_json`` reproduces that
contract from a sweep/run_checks result frame.

Kahn-framework classification per check family follows the public DQD
check-description catalog (category / subcategory / context).
"""

from __future__ import annotations

import json
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame

# family → (checkLevel, Kahn category, Kahn subcategory, context)
FAMILY_KAHN: dict[str, tuple[str, str, str, str]] = {
    "cdmTable": ("TABLE", "Conformance", "Relational", "Verification"),
    "cdmField": ("FIELD", "Conformance", "Relational", "Verification"),
    "cdmDatatype": ("FIELD", "Conformance", "Value", "Verification"),
    "isRequired": ("FIELD", "Completeness", "", "Validation"),
    "isPrimaryKey": ("FIELD", "Conformance", "Relational", "Verification"),
    "isForeignKey": ("FIELD", "Conformance", "Relational", "Verification"),
    "fkDomain": ("FIELD", "Conformance", "Value", "Verification"),
    "fkClass": ("FIELD", "Conformance", "Computational", "Verification"),
    "measurePersonCompleteness": ("TABLE", "Completeness", "", "Validation"),
    "measureValueCompleteness": ("FIELD", "Completeness", "", "Verification"),
    "standardConceptRecordCompleteness": ("FIELD", "Completeness", "", "Verification"),
    "sourceConceptRecordCompleteness": ("FIELD", "Completeness", "", "Verification"),
    "sourceValueCompleteness": ("FIELD", "Completeness", "", "Verification"),
    "plausibleValueLow": ("FIELD", "Plausibility", "Atemporal", "Verification"),
    "plausibleValueHigh": ("FIELD", "Plausibility", "Atemporal", "Verification"),
    "plausibleStartBeforeEnd": ("FIELD", "Plausibility", "Temporal", "Verification"),
    "plausibleAfterBirth": ("FIELD", "Plausibility", "Temporal", "Verification"),
    "plausibleBeforeDeath": ("FIELD", "Plausibility", "Temporal", "Verification"),
    "withinVisitDates": ("FIELD", "Plausibility", "Temporal", "Verification"),
    "plausibleGenderUseDescendants": ("FIELD", "Plausibility", "Atemporal", "Validation"),
    "plausibleUnitConceptIds": ("FIELD", "Plausibility", "Atemporal", "Verification"),
}


def _category(family: str) -> str:
    return FAMILY_KAHN.get(family, ("FIELD", "Conformance", "", "Verification"))[1]


def summarize_overview(rows: list[dict[str, Any]]) -> dict[str, int]:
    """The reference's Overview block (data_quality.py:301-318)."""
    count_total = len(rows)
    failed = [r for r in rows if r.get("failed") == 1]
    count_error_failed = len([r for r in rows if r.get("is_error")])
    count_overall_failed = len(failed)
    count_passed = count_total - count_overall_failed

    def _cat_counts(cat: str) -> tuple[int, int]:
        in_cat = [r for r in rows if _category(r.get("check_family", "")) == cat]
        return len(in_cat), len([r for r in in_cat if r.get("failed") == 1])

    tot_p, fail_p = _cat_counts("Plausibility")
    tot_cf, fail_cf = _cat_counts("Conformance")
    tot_cp, fail_cp = _cat_counts("Completeness")
    return {
        "countTotal": count_total,
        "countThresholdFailed": count_overall_failed - count_error_failed,
        "countErrorFailed": count_error_failed,
        "countOverallFailed": count_overall_failed,
        "countPassed": count_passed,
        "percentPassed": round(count_passed / count_total * 100) if count_total else 0,
        "percentFailed": round(count_overall_failed / count_total * 100)
        if count_total
        else 0,
        "countTotalPlausibility": tot_p,
        "countTotalConformance": tot_cf,
        "countTotalCompleteness": tot_cp,
        "countFailedPlausibility": fail_p,
        "countFailedConformance": fail_cf,
        "countFailedCompleteness": fail_cp,
        "countPassedPlausibility": tot_p - fail_p,
        "countPassedConformance": tot_cf - fail_cf,
        "countPassedCompleteness": tot_cp - fail_cp,
    }


def _clean_null_terms(d: dict[str, Any]) -> dict[str, Any]:
    return {k: v for k, v in d.items() if v is not None}


def build_dqd_document(
    results: DataFrame,
    metadata: dict[str, Any] | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
) -> dict[str, Any]:
    """Viewer-shaped document from a sweep / run_checks result frame.

    CheckResults rows carry UPPERCASE field names except ``checkid``
    (reference data_quality.py:162-167), null terms dropped, and the
    Kahn CHECK_LEVEL/CATEGORY/SUBCATEGORY/CONTEXT columns derived from
    the check family.
    """
    start = start or datetime.now()
    end = end or datetime.now()
    rows = [r.asDict() for r in results.collect()]
    check_results = []
    for i, r in enumerate(rows):
        family = r.get("check_family", "")
        level, category, subcategory, context = FAMILY_KAHN.get(
            family, ("FIELD", "Conformance", "", "Verification")
        )
        pct = r.get("pct_violated_rows")
        item = {
            "checkid": f"{family}_{i}",
            "CHECK_NAME": r.get("check_name"),
            "CHECK_LEVEL": level,
            "CATEGORY": category,
            "SUBCATEGORY": subcategory or None,
            "CONTEXT": context,
            "CDM_TABLE_NAME": r.get("cdm_table"),
            "CDM_FIELD_NAME": r.get("cdm_field"),
            "NUM_VIOLATED_ROWS": r.get("num_violated_rows"),
            # viewer renders percentages 0-100
            "PCT_VIOLATED_ROWS": pct * 100 if pct is not None else None,
            "NUM_DENOMINATOR_ROWS": r.get("num_denominator_rows"),
            "THRESHOLD_VALUE": (
                r.get("threshold") * 100 if r.get("threshold") is not None else None
            ),
            "FAILED": r.get("failed"),
            "PASSED": 0 if r.get("failed") else 1,
            "STATUS": "FAILED" if r.get("failed") else "PASS",
        }
        check_results.append(_clean_null_terms(item))
    return {
        "startTimestamp": start,
        "endTimestamp": end,
        "executionTime": f"{(end - start).total_seconds():.2f} secs",
        "Overview": summarize_overview(rows),
        "Metadata": metadata or {},
        "CheckResults": check_results,
    }


def export_dqd_json(
    results: DataFrame,
    path: str,
    metadata: dict[str, Any] | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
) -> dict[str, Any]:
    """Write the viewer JSON (indent=4, sorted keys, stringified dates —
    reference data_quality.py:168-173) and return the document."""
    doc = build_dqd_document(results, metadata, start, end)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, indent=4, sort_keys=True, default=str)
    return doc
