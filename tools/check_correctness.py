"""Local stand-in for the driver's correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, column names/types, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")

    from rabbit_in_a_blender_spark.plans.catalog import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
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
            else:
                ok = True
                status = [f"rows-only n={len(srows)}"]
            dt = time.time() - t0
            print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:5.1f}s  {' '.join(status)}")
            if not ok:
                failed.append(name)
                if srows and name in oracles:
                    sn, on = _normalize(srows), _normalize(orows)
                    sset, oset = set(sn), set(on)
                    print(f"  spark-only: {list(sset - oset)[:3]}")
                    print(f"  oracle-only: {list(oset - sset)[:3]}")
        except Exception:
            failed.append(name)
            print(f"ERROR {name}")
            traceback.print_exc(limit=5)
    print(f"\n{len(failed)} failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
