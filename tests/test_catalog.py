"""Catalog integrity: every query runs at sf0.001 with a stable schema,
and a sample is verified against its DuckDB oracle in-process."""

from __future__ import annotations

import os

import pytest

from rabbit_in_a_blender_spark.plans.catalog import all_oracles, all_queries

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_every_oracle_has_a_query():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_runs_and_is_nonempty_schema(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    assert df.columns, name
    # cheap execution check (limit keeps runtime bounded)
    df.limit(5).collect()


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "j4_nullsafe_join", "seq_swap_assign", "ext_langid"]
)
def test_sample_queries_match_duckdb(spark, name):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import duckdb

    from check_correctness import value_hash
    from rabbit_in_a_blender_spark.core.io import TPCH_TABLES, table_path

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    sdf = all_queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    orows = con.sql(all_oracles()[name]).df().to_dict("records")
    assert value_hash(srows) == value_hash(orows), name
