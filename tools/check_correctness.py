"""Local stand-in for the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, column names/types, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]

--json additionally writes the per-query results in the driver's
CORRECTNESS_r{N}.json row format — the committed FULLGATE_r{N}.json
artifact (VERDICT r6 task 3): the driver's per-round cap (~50 rows)
structurally leaves a stale tail, so the builder's own full-catalog
run is recorded for the judge to audit instead of re-run.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from rabbit_in_a_blender_spark.core.io import TPCH_TABLES, table_path
from rabbit_in_a_blender_spark.core.session import get_spark


def _normalize(rows: list[dict]) -> list[tuple]:
    out = []
    for r in rows:
        key = tuple(sorted(r.keys()))
        vals = []
        for k in key:
            v = r[k]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def value_hash(rows: list[dict]) -> str:
    h = hashlib.sha256()
    for t in _normalize(rows):
        h.update("\x1f".join(t).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")

    from rabbit_in_a_blender_spark.plans.catalog import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    failed = []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            # release track_cache-pinned intermediates so a full-catalog
            # session doesn't accumulate 212 queries' worth of cache
            for c in getattr(sdf, "_graft_cached", []):
                try:
                    c.unpersist()
                except Exception:
                    pass
            status = ["?"]
            if name in oracles:
                orows = con.sql(oracles[name]).df().to_dict("records")
                ok_n = len(srows) == len(orows)
                scols = sorted(sdf.columns)
                ocols = sorted(con.sql(oracles[name]).columns)
                ok_c = scols == ocols
                ok_h = value_hash(srows) == value_hash(orows)
                ok = ok_n and ok_c and ok_h
                status = [
                    f"rows={'OK' if ok_n else f'{len(srows)}!={len(orows)}'}",
                    f"cols={'OK' if ok_c else f'{scols}!={ocols}'}",
                    f"hash={'OK' if ok_h else 'MISMATCH'}",
                ]
                results[name] = {
                    "rows_match": ok_n, "schema_match": ok_c,
                    "hash_match": ok_h, "spark_rows": len(srows),
                    "oracle_rows": len(orows), "err": None,
                }
            else:
                ok = True
                status = [f"rows-only n={len(srows)}"]
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(srows),
                    "oracle_rows": None, "err": "no_oracle",
                }
            dt = time.time() - t0
            print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:5.1f}s  {' '.join(status)}")
            if not ok:
                failed.append(name)
                if srows and name in oracles:
                    sn, on = _normalize(srows), _normalize(orows)
                    sset, oset = set(sn), set(on)
                    print(f"  spark-only: {list(sset - oset)[:3]}")
                    print(f"  oracle-only: {list(oset - sset)[:3]}")
        except Exception as exc:
            failed.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            print(f"ERROR {name}")
            traceback.print_exc(limit=5)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {len(results)} rows -> {json_out}")
    print(f"\n{len(failed)} failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
