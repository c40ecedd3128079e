"""Source-ingest queries: the A1/A2/M4 operators driven end-to-end.

The driver testdata is parquet-only, so the CSV/TSV scan and
truncate-refill operators (SURVEY §2.A A1/A2, M4) were previously
pytest-covered only.  This query closes that gap: it GENERATES an
Athena-style vocabulary TSV deterministically from the nation table,
ingests it through ``read_tsv_vocab`` (tab separator, explicit schema,
``yyyyMMdd`` date coercion — reference import_vocabularies.py:179-184),
truncate-refills a warehouse table twice (stale subset first, then the
full refill, proving replace-not-append semantics — reference
cleanup/load flow), and returns the final table.  The DuckDB oracle
recomputes the identical rows from nation with pure SQL, so the hash
proves the whole write→scan→coerce→refill path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.io import load_tables
from ..pipeline.warehouse import Warehouse
from ..sources.readers import read_tsv_vocab
from .catalog import register

_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("concept_id", T.LongType()),
        T.StructField("concept_code", T.StringType()),
        T.StructField("concept_name", T.StringType()),
        T.StructField("valid_start_date", T.DateType()),
        T.StructField("valid_end_date", T.DateType()),
    ]
)


@register(
    "tsv_vocab_ingest",
    oracle="""
    SELECT n_nationkey AS concept_id,
           'C' || CAST(n_nationkey AS VARCHAR) AS concept_code,
           n_name AS concept_name,
           strftime(DATE '1970-01-01'
                    + CAST(n_nationkey * 100 AS INTEGER), '%Y-%m-%d')
             AS valid_start_date,
           strftime(DATE '1970-01-01'
                    + CAST(n_nationkey * 150 + 1000 AS INTEGER), '%Y-%m-%d')
             AS valid_end_date
    FROM nation
    """,
)
def tsv_vocab_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/M4 end-to-end: nation → Athena-style TSV (yyyyMMdd dates) →
    ``read_tsv_vocab`` → stale write + truncate-refill → final table."""
    nation = load_tables(spark, sf_dir, "nation")["nation"]
    epoch = F.lit("1970-01-01").cast("date")
    vocab = nation.select(
        F.col("n_nationkey").alias("concept_id"),
        F.concat(F.lit("C"), F.col("n_nationkey").cast("string")).alias(
            "concept_code"
        ),
        F.col("n_name").alias("concept_name"),
        F.date_add(epoch, (F.col("n_nationkey") * 100).cast("int")).alias(
            "valid_start_date"
        ),
        F.date_add(
            epoch, (F.col("n_nationkey") * 150 + 1000).cast("int")
        ).alias("valid_end_date"),
    )

    # 1. Write the Athena-style export: tab-separated, dates as yyyyMMdd
    #    strings.  (Left on disk under the system tmp dir — the returned
    #    plan reads the warehouse parquet lazily, so inputs must outlive
    #    this function.)
    root = tempfile.mkdtemp(prefix="riab_tsv_ingest_")
    tsv_dir = os.path.join(root, "CONCEPT.csv")
    vocab.select(
        "concept_id",
        "concept_code",
        "concept_name",
        F.date_format("valid_start_date", "yyyyMMdd").alias("valid_start_date"),
        F.date_format("valid_end_date", "yyyyMMdd").alias("valid_end_date"),
    ).repartition(1).write.option("sep", "\t").csv(
        tsv_dir, header=True, mode="overwrite"
    )

    # 2. Ingest through the A2 reader: explicit schema, yyyyMMdd coercion.
    ingested = read_tsv_vocab(spark, tsv_dir, _VOCAB_SCHEMA)

    # 3. M4 truncate-refill: seed the target with a stale subset, then
    #    refill with the full ingest; the final read must show ONLY the
    #    refilled rows (replace, not append).
    wh = Warehouse(os.path.join(root, "wh"))
    wh.write(ingested.filter(F.col("concept_id") < 5), "omop", "concept_stage")
    wh.write(ingested, "omop", "concept_stage")

    out = wh.read(spark, "omop", "concept_stage")
    return out.select(
        "concept_id",
        "concept_code",
        "concept_name",
        F.date_format("valid_start_date", "yyyy-MM-dd").alias(
            "valid_start_date"
        ),
        F.date_format("valid_end_date", "yyyy-MM-dd").alias("valid_end_date"),
    )
