"""Static DQD dashboard HTML: rollup math, layout, embedding safety
(reference layout: data_quality_dashboard.py:47-358 — Kahn grid of
category × context Pass/Fail/Total/%Pass over a filterable table)."""

from __future__ import annotations

import json
import re

from rabbit_in_a_blender_spark.quality.dashboard_html import (
    _rollup,
    render_dqd_html,
)


def _doc(rows):
    return {
        "startTimestamp": "2024-01-01 00:00:00",
        "endTimestamp": "2024-01-01 00:01:00",
        "executionTime": "60.00 secs",
        "Overview": {},
        "Metadata": {"CDM_SOURCE_NAME": "unit <test>"},
        "CheckResults": rows,
    }


def _row(category, context, failed, **kw):
    base = {
        "checkid": "x",
        "CHECK_NAME": kw.get("name", "check"),
        "CHECK_LEVEL": "FIELD",
        "CATEGORY": category,
        "CONTEXT": context,
        "CDM_TABLE_NAME": kw.get("table", "person"),
        "FAILED": failed,
        "STATUS": "FAILED" if failed else "PASS",
        "PCT_VIOLATED_ROWS": kw.get("pct", 0.0),
    }
    return base


def test_rollup_grid_math():
    rows = [
        _row("Plausibility", "Verification", 0),
        _row("Plausibility", "Verification", 1),
        _row("Plausibility", "Validation", 0),
        _row("Conformance", "Verification", 0),
        _row("Completeness", "Validation", 1),
    ]
    cells = _rollup(rows)
    assert cells["Plausibility|Verification"] == {"pass": 1, "fail": 1, "total": 2}
    assert cells["Plausibility|all"] == {"pass": 2, "fail": 1, "total": 3}
    assert cells["all|Verification"] == {"pass": 2, "fail": 1, "total": 3}
    assert cells["all|all"] == {"pass": 3, "fail": 2, "total": 5}
    assert cells["Conformance|Validation"] == {"pass": 0, "fail": 0, "total": 0}


def test_render_is_self_contained_and_safe():
    rows = [
        _row("Conformance", "Verification", 0, name="</script><b>inject"),
        _row("Plausibility", "Validation", 1, pct=12.5),
    ]
    page = render_dqd_html(_doc(rows))
    # no external requests: no src=/href= URLs at all
    assert not re.search(r'(src|href)\s*=\s*"http', page)
    # script-tag breakout from embedded data is escaped
    payload = page.split('id="dqd-data" type="application/json">')[1]
    payload = payload.split("</script>")[0]
    assert "</script>" not in payload
    doc = json.loads(payload.replace("<\\/", "</"))
    assert doc["CheckResults"][0]["CHECK_NAME"] == "</script><b>inject"
    # metadata is HTML-escaped
    assert "unit &lt;test&gt;" in page
    # Kahn grid headers + both contexts present
    assert "Verification" in page and "Validation" in page
    for cat in ("Plausibility", "Conformance", "Completeness"):
        assert f'<th class="rowhead">{cat}</th>' in page
    # total row: 1 pass / 1 fail / 2 total / 50%
    total_row = page.split('<th class="rowhead">Total</th>')[1].split("</tr>")[0]
    assert (
        "<td>1</td>" in total_row
        and '<td class="fail-nonzero">1</td>' in total_row
        and "<td>50%</td>" in total_row
    )


def test_export_from_frame(spark, tmp_path):
    from rabbit_in_a_blender_spark.quality.dashboard_html import export_dqd_html

    results = spark.createDataFrame(
        [
            ("isRequired", "person.person_id required", "person", "person_id",
             0, 100, 0.0, 0.05, 0),
            ("fkDomain", "person.gender domain", "person", "gender_concept_id",
             7, 100, 0.07, 0.0, 1),
        ],
        "check_family string, check_name string, cdm_table string, "
        "cdm_field string, num_violated_rows long, num_denominator_rows long, "
        "pct_violated_rows double, threshold double, failed int",
    )
    out = tmp_path / "dqd.html"
    page = export_dqd_html(results, str(out))
    assert out.read_text() == page
    # one Completeness pass (Validation ctx), one Conformance fail (Verification)
    assert '<th class="rowhead">Total</th>' in page
    doc = json.loads(
        page.split('id="dqd-data" type="application/json">')[1]
        .split("</script>")[0]
        .replace("<\\/", "</")
    )
    assert doc["Overview"]["countTotal"] == 2
    assert doc["Overview"]["countOverallFailed"] == 1
    statuses = {r["CHECK_NAME"]: r["STATUS"] for r in doc["CheckResults"]}
    assert statuses["person.gender domain"] == "FAILED"


def test_result_cells_are_html_escaped(spark, tmp_path):
    """Warehouse data is not guaranteed clean: a check name carrying
    markup must be escaped by the JS renderer (stored-XSS guard)."""
    import json

    from pyspark.sql import Row

    from rabbit_in_a_blender_spark.quality.dashboard_html import export_dqd_html

    results = spark.createDataFrame(
        [
            (
                "Completeness", "<script>alert(1)</script>", "person",
                "gender_concept_id", 0, 100, 0.0, 0.05, 0,
            ),
        ],
        "check_family string, check_name string, cdm_table string, "
        "cdm_field string, num_violated_rows long, num_denominator_rows long, "
        "pct_violated_rows double, threshold double, failed int",
    )
    out = tmp_path / "dqd.html"
    page = export_dqd_html(results, str(out))
    # the embedded JSON payload must not break out of its script tag
    assert "</script>alert" not in page.split('id="dqd-data"')[1].split("</script>")[0]
    # the renderer escapes every cell before innerHTML interpolation
    assert "function esc(" in page
    assert "${esc(c)}" in page
    # round-trip: the payload still carries the raw name for filtering
    doc = json.loads(
        page.split('id="dqd-data" type="application/json">')[1]
        .split("</script>")[0]
        .replace("<\\/", "</")
    )
    assert doc["CheckResults"][0]["CHECK_NAME"] == "<script>alert(1)</script>"
