"""Dump .explain('formatted') output for catalog queries (r13 deliverable).

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query, containing the
formatted physical plan of the query's result frame as built at the
CURRENT working tree (run it from a worktree pinned to an older commit
to capture "before" plans).  Plans are built lazily — nothing executes
except the tiny driver work some operators do at plan-build time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rabbit_in_a_blender_spark.core.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    from rabbit_in_a_blender_spark.plans.catalog import all_queries

    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in catalog", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - tool reports and moves on
            plan = f"ERROR building {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
