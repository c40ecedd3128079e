"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced through the noop sink (full computation, no driver
collect) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rabbit_in_a_blender_spark.core.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q18_large_volume_customer",
    "g1_duplicate_groups",
    "w3_window_dedup",
    "seq_assign_scalable",
    "stream_tumbling_1h",
    "stream_session_30m",
    "ext_dedup_minhash_lsh",
    "ext_embed_cosine_topk",
    "ext_dedup_exact",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    from rabbit_in_a_blender_spark.plans.catalog import all_queries

    queries = all_queries()
    # Warm the JVM/session with a trivial action so q1 isn't charged startup.
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
