"""Static HTML rendering of the DQD dashboard — no web server needed.

The reference embeds a Dash web app (reference
src/riab/etl/data_quality_dashboard.py:47-358): a Kahn rollup grid
(Plausibility/Conformance/Completeness × Verification/Validation with
Pass/Fail/Total/%Pass cells, :98-216) above a filterable, sortable,
paginated results table (:231-259).  Dash isn't in this container and a
long-running server is the wrong shape for a batch engine, so this
module renders the SAME layout as one self-contained HTML file — inline
CSS/JS, zero external requests — from the viewer-contract document that
``quality.dashboard.build_dqd_document`` produces.  Open it in any
browser; filtering/sorting/paging run client-side over the embedded
JSON.
"""

from __future__ import annotations

import html as _html
import json
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame

from .dashboard import build_dqd_document

_CATEGORIES = ("Plausibility", "Conformance", "Completeness")
_CONTEXTS = ("Verification", "Validation")

_CSS = """
body{font-family:system-ui,-apple-system,'Segoe UI',sans-serif;margin:24px;color:#1a1a2e}
h2{color:navy}
table{border-collapse:collapse;margin:12px 0;width:100%}
th,td{border:1px solid #cbd5e1;padding:6px 10px;text-align:right;font-size:14px}
th{background:#eef2f7}
th.rowhead{text-align:right}
td.fail-nonzero{color:#b91c1c;font-weight:600}
#results td:nth-child(6){text-align:left}
#results td:nth-child(1){font-weight:600}
#results tr.failed td:nth-child(1){color:#b91c1c}
#results tr.passed td:nth-child(1){color:#15803d}
.controls{margin:10px 0;display:flex;gap:12px;align-items:center}
.controls input{padding:6px 8px;border:1px solid #cbd5e1;border-radius:4px;width:320px}
.controls button{padding:6px 12px;border:1px solid #cbd5e1;background:#fff;border-radius:4px;cursor:pointer}
.meta{color:#475569;font-size:13px;margin:4px 0}
th.sortable{cursor:pointer}
th.sortable:after{content:' \\2195';color:#94a3b8}
"""

_JS = """
const DOC = JSON.parse(document.getElementById('dqd-data').textContent);
const ROWS = DOC.CheckResults.map(r => ({
  status: r.STATUS || (r.FAILED ? 'FAILED' : 'PASS'),
  table: r.CDM_TABLE_NAME || '',
  field: r.CDM_FIELD_NAME || '',
  category: r.CATEGORY || '',
  subcategory: r.SUBCATEGORY || '',
  level: r.CHECK_LEVEL || '',
  name: r.CHECK_NAME || '',
  pct: r.PCT_VIOLATED_ROWS == null ? null : r.PCT_VIOLATED_ROWS,
}));
let filtered = ROWS, page = 0, sortKey = null, sortDir = 1;
const PAGE = 10;
function fmtPct(v){ return v == null ? '' : v.toFixed(2) + '%'; }
function esc(v){
  return String(v ?? '').replace(/&/g, '&amp;').replace(/</g, '&lt;')
    .replace(/>/g, '&gt;').replace(/"/g, '&quot;');
}
function render(){
  const tbody = document.querySelector('#results tbody');
  const start = page * PAGE;
  const rows = filtered.slice(start, start + PAGE);
  tbody.innerHTML = rows.map(r =>
    `<tr class="${r.status === 'FAILED' ? 'failed' : 'passed'}">` +
    [r.status, r.table, r.field, r.category, r.subcategory, r.level, r.name,
     fmtPct(r.pct)].map(c => `<td>${esc(c)}</td>`).join('') + '</tr>').join('');
  document.getElementById('page-info').textContent =
    `${filtered.length ? start + 1 : 0}-${Math.min(start + PAGE, filtered.length)} of ${filtered.length}`;
}
function applyFilter(){
  const q = document.getElementById('filter').value.toLowerCase();
  filtered = ROWS.filter(r =>
    !q || Object.values(r).some(v => String(v ?? '').toLowerCase().includes(q)));
  if (sortKey) filtered.sort((a, b) =>
    sortDir * ((a[sortKey] ?? '') > (b[sortKey] ?? '') ? 1 : -1));
  page = 0; render();
}
document.getElementById('filter').addEventListener('input', applyFilter);
document.getElementById('prev').addEventListener('click',
  () => { if (page > 0) { page--; render(); } });
document.getElementById('next').addEventListener('click',
  () => { if ((page + 1) * PAGE < filtered.length) { page++; render(); } });
document.querySelectorAll('#results th.sortable').forEach(th =>
  th.addEventListener('click', () => {
    const k = th.dataset.key;
    sortDir = sortKey === k ? -sortDir : 1; sortKey = k; applyFilter();
  }));
applyFilter();
"""


def _rollup(rows: list[dict[str, Any]]) -> dict[str, dict[str, int]]:
    """(category|'all') × (context|'all') → pass/fail/total counters,
    the numbers the reference's callbacks fill into the grid cells
    (data_quality_dashboard.py:288-358)."""
    cells: dict[str, dict[str, int]] = {}
    for cat in _CATEGORIES + ("all",):
        for ctx in _CONTEXTS + ("all",):
            cells[f"{cat}|{ctx}"] = {"pass": 0, "fail": 0, "total": 0}
    for r in rows:
        cat, ctx = r.get("CATEGORY", ""), r.get("CONTEXT", "")
        failed = 1 if r.get("FAILED") else 0
        for ckey in (cat, "all"):
            for xkey in (ctx, "all"):
                cell = cells.get(f"{ckey}|{xkey}")
                if cell is not None:
                    cell["total"] += 1
                    cell["fail" if failed else "pass"] += 1
    return cells


def _grid_cells(cell: dict[str, int]) -> str:
    pct = f"{cell['pass'] / cell['total'] * 100:.0f}%" if cell["total"] else "-"
    fail_cls = ' class="fail-nonzero"' if cell["fail"] else ""
    return (
        f"<td>{cell['pass']}</td><td{fail_cls}>{cell['fail']}</td>"
        f"<td>{cell['total']}</td><td>{pct}</td>"
    )


def render_dqd_html(doc: dict[str, Any]) -> str:
    """Self-contained dashboard HTML from a viewer-contract document."""
    rows = doc.get("CheckResults", [])
    cells = _rollup(rows)
    meta = doc.get("Metadata") or {}
    meta_bits = [
        _html.escape(f"{k}: {v}")
        for k, v in meta.items()
        if isinstance(v, (str, int, float)) and v != ""
    ]
    grid_rows = []
    for cat in _CATEGORIES + ("all",):
        label = "Total" if cat == "all" else cat
        tds = "".join(
            _grid_cells(cells[f"{cat}|{ctx}"]) for ctx in _CONTEXTS + ("all",)
        )
        grid_rows.append(f'<tr><th class="rowhead">{label}</th>{tds}</tr>')
    result_headers = "".join(
        f'<th class="sortable" data-key="{key}">{name}</th>'
        for name, key in (
            ("Status", "status"), ("Table", "table"), ("Field", "field"),
            ("Category", "category"), ("SubCategory", "subcategory"),
            ("Level", "level"), ("Check", "name"), ("% records", "pct"),
        )
    )
    # "</script>"-safe JSON embedding: escape the tag-open inside data
    payload = json.dumps(doc, default=str).replace("</", "<\\/")
    sub_headers = "".join(
        "<th>Pass</th><th>Fail</th><th>Total</th><th>% Pass</th>" for _ in range(3)
    )
    return f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>Data Quality Dashboard</title>
<style>{_CSS}</style></head>
<body>
<h2>Data Quality Dashboard</h2>
<p class="meta">{' &middot; '.join(meta_bits)}</p>
<p class="meta">run: {_html.escape(str(doc.get('startTimestamp', '')))} &rarr;
{_html.escape(str(doc.get('endTimestamp', '')))}
({_html.escape(str(doc.get('executionTime', '')))})</p>
<table id="overview">
<thead>
<tr><th rowspan="2"></th><th colspan="4">Verification</th>
<th colspan="4">Validation</th><th colspan="4">Total</th></tr>
<tr>{sub_headers}</tr>
</thead>
<tbody>{''.join(grid_rows)}</tbody>
</table>
<div class="controls">
<input id="filter" type="search" placeholder="filter checks (table, status, category...)">
<button id="prev">&laquo; prev</button>
<span id="page-info" class="meta"></span>
<button id="next">next &raquo;</button>
</div>
<table id="results">
<thead><tr>{result_headers}</tr></thead>
<tbody></tbody>
</table>
<script id="dqd-data" type="application/json">{payload}</script>
<script>{_JS}</script>
</body></html>
"""


def export_dqd_html(
    results: DataFrame,
    path: str,
    metadata: dict[str, Any] | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
) -> str:
    """Render a sweep / run_checks result frame straight to HTML."""
    doc = build_dqd_document(results, metadata, start, end)
    text = render_dqd_html(doc)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    return text
