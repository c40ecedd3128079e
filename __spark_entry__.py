"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``rabbit_in_a_blender_spark`` package; the
query/oracle inventory is the plans catalog
(rabbit_in_a_blender_spark/plans/*.py), one entry per SURVEY.md §2
operator.

Ordering policy (this file, not the library): the driver adjudicates
``queries()`` in dict order and caps the per-round check at ~50
queries, so with a 90+ query catalog a fixed order would leave the
same tail permanently unverified.  ``_verification_order`` therefore
emits:

1. ``_REVERIFY_FIRST`` — queries whose implementation changed after
   their last green CORRECTNESS row (maintained by hand each round);
2. queries with no green row in any committed CORRECTNESS_r*.json
   (new this round), in catalog registration order;
3. everything else, stalest green round first.

The rotation maximizes cumulative oracle coverage across rounds while
re-earning the hard signal on exactly the code that moved.  The
library API (plans/catalog.py all_queries/all_oracles) stays in stable
registration order — this environment-dependent sampling concern
belongs to the harness that owns the CORRECTNESS artifacts.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Queries whose source files changed after the round that last proved
# them (VERDICT r2 "what's wrong" §1 + files edited in round 3).
_REVERIFY_FIRST = [
    # operators/sequence.py changed in r2 after their r1 green rows
    "w2_rownumber_ids_strict",
    "seq_swap_assign",
    "seq_assign_scalable",
    # mapping/swap.py changed in r2 (AQE-decided join)
    "j3_fk_swap_routing",
    # mapping/events.py touched in r2
    "j9_polymorphic_event_join",
    # quality/dqd_sweep.py changed in r3 (lookup-key dedupe fix +
    # shared persisted lookup projections)
    "dq_sweep_detail",
    "dq_sweep_summary",
    "dq_plausible_value_low",
    "dq_fk_orphans",
    "dq_start_before_end",
    # quality/achilles_catalog.py grew in r3 (221 → 230 analyses); the
    # r2-green catalog queries run through the changed module
    "achilles_counts_catalog",
    "achilles_dists_catalog",
    "achilles_continuous_obs",
    "achilles_strata_counts",
]


def _last_green_rounds(has_oracle: set[str]) -> dict[str, int]:
    """name → latest round with a green CORRECTNESS row, from the
    committed CORRECTNESS_r*.json files next to this entry point."""
    last_green: dict[str, int] = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                results = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, res in results.items():
            if not isinstance(res, dict) or res.get("err"):
                continue
            ok = (
                res.get("rows_match", res.get("spark_rows") is not None)
                and res.get("schema_match", True)
                # rows-only queries (no oracle) can't hash-match by design
                and (res.get("hash_match") or name not in has_oracle)
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green


def _verification_order(names: list[str], has_oracle: set[str]) -> list[str]:
    last_green = _last_green_rounds(has_oracle)
    reg_index = {name: i for i, name in enumerate(names)}
    first = [n for n in _REVERIFY_FIRST if n in reg_index]
    rest = [n for n in names if n not in set(first)]
    rest.sort(key=lambda n: (last_green.get(n, -1), reg_index[n]))
    return first + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: grouped pricing summary
    (scan → filter → project → groupBy/agg), the engine's spine."""
    from rabbit_in_a_blender_spark.plans.catalog import get

    return get("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    unverified/stale-first (see module docstring)."""
    from rabbit_in_a_blender_spark.plans.catalog import all_oracles, all_queries

    qs = all_queries()
    order = _verification_order(list(qs), set(all_oracles()))
    return {name: qs[name] for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from rabbit_in_a_blender_spark.plans.catalog import all_oracles

    return all_oracles()
