"""Physical-plan audit for every catalog query — the scale feedback loop.

For each query, reports:
- exchanges: shuffle count (Exchange hashpartitioning/rangepartitioning)
- single_part: count of single-partition exchanges (SinglePartition) —
  the global-window hazard flagged in SURVEY §7
- broadcasts: BroadcastExchange/BroadcastHashJoin count
- smj: SortMergeJoin count (a big-big join; fine when both sides are big)
- pushed: whether any parquet scan carries PushedFilters
- codegen: WholeStageCodegen span count (JVM-side execution width)

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Writes a markdown table to stdout; non-zero exit if any query trips a
hard rule (scan without column pruning is impossible to detect reliably
from the string plan, so rules are advisory prints, not failures).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from rabbit_in_a_blender_spark.core.session import get_spark


def audit(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange (?:hash|range)partitioning", plan)),
        "single_part": plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        # whole-stage codegen shows as "*(N) Op" prefixes in executedPlan
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        # a single-partition exchange feeding a Window (global-order
        # window) is the true 100 TB hazard; one feeding a final scalar
        # aggregate is fine (partial agg already shrank the data)
        "global_window": bool(
            re.search(r"Exchange SinglePartition[\s\S]{0,400}?\bWindow\b", plan)
            or re.search(r"\bWindow\b[\s\S]{0,400}?Exchange SinglePartition", plan)
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    from rabbit_in_a_blender_spark.plans.catalog import all_queries

    rows = []
    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            # run through the noop sink so AQE finalizes the plan —
            # the audited plan is the one that actually executed
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, audit(plan)))
        except Exception as e:  # noqa: BLE001
            rows.append((name, {"error": str(e)[:60]}))

    print("| query | shuffles | 1-part | bcast | smj | pushdown | codegen |")
    print("|---|---|---|---|---|---|---|")
    warns = []
    for name, a in rows:
        if "error" in a:
            print(f"| {name} | ERROR: {a['error']} |")
            continue
        print(
            f"| {name} | {a['exchanges']} | {a['single_part']} | "
            f"{a['broadcasts']} | {a['smj']} | "
            f"{'Y' if a['pushed'] else '-'} | {a['codegen']} |"
        )
        if a["global_window"]:
            warns.append(
                f"{name}: global-order window over a single partition — "
                "strict-order mode only; use the *_scalable variant at scale"
            )
    if warns:
        print()
        for w in warns:
            print("WARN", w)


if __name__ == "__main__":
    main()
