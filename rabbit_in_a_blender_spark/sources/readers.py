"""Source readers (SURVEY §2.A): typed CSV/TSV scans and the Athena
vocabulary import flow.

Reference behaviors re-expressed:
- A1 CSV scan with explicit schema (usagi/custom CSVs, etl/etl.py:744-794)
- A2 TSV scan + '%Y%m%d' date coercion (vocab CSVs,
  etl/import_vocabularies.py:164-185)
- vocabulary refresh: per-table load → sort by id → write to work, then
  atomic refill of the omop-zone table
  (bq:vocabulary/vocabulary_table_refill.sql.jinja:3-6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline.warehouse import Warehouse

# The 9 Athena vocabulary tables (etl/import_vocabularies.py:40-121).
VOCABULARY_TABLES = (
    "concept",
    "concept_ancestor",
    "concept_class",
    "concept_relationship",
    "concept_synonym",
    "domain",
    "drug_strength",
    "relationship",
    "vocabulary",
)


def read_csv_typed(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """A1: CSV with an explicit schema — never inferSchema in a pipeline
    (a schema-inference pass is a full extra read at scale)."""
    return spark.read.csv(path, schema=schema, header=header, mode="PERMISSIVE")


def read_tsv_vocab(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    date_cols: tuple[str, ...] = ("valid_start_date", "valid_end_date"),
) -> DataFrame:
    """A2: tab-separated Athena export; date columns arrive as yyyyMMdd
    strings and are coerced (etl/import_vocabularies.py:179-184)."""
    str_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name in date_cols else f.dataType)
            for f in schema.fields
        ]
    )
    df = spark.read.option("sep", "\t").csv(path, schema=str_schema, header=True)
    for c in date_cols:
        if c in df.columns:
            df = df.withColumn(c, F.to_date(F.col(c), "yyyyMMdd"))
    return df


def import_vocabulary_dir(
    spark: SparkSession,
    warehouse: Warehouse,
    vocab_dir: str,
    schemas: dict[str, T.StructType],
) -> list[str]:
    """Vocabulary import: for each CSV present, read → sort by first (id)
    column (pre-load sort, import_vocabularies.py:156-158) → stage in
    work → atomic refill of the omop table.  Returns imported tables."""
    imported = []
    for table in VOCABULARY_TABLES:
        src = os.path.join(vocab_dir, f"{table.upper()}.csv")
        if not os.path.isfile(src) or table not in schemas:
            continue
        df = read_tsv_vocab(spark, src, schemas[table])
        df = df.sort(df.columns[0])
        warehouse.write(df, "work", f"vocab__{table}")
        staged = warehouse.read(spark, "work", f"vocab__{table}")
        warehouse.write(staged, "omop", table)
        imported.append(table)
    return imported


def import_vocabulary_zip(
    spark: SparkSession,
    warehouse: Warehouse,
    zip_path: str,
    schemas: dict[str, T.StructType],
) -> list[str]:
    """Reference ``--import-vocabularies <zip>`` (import_vocabularies.py:
    40-121): an Athena download is a zip of per-table TSV-ish CSVs —
    unzip to a scratch dir, then the directory import does the rest.

    The unzip is driver-side on purpose: Athena zips are single files,
    and Spark reads the extracted CSVs in parallel afterwards."""
    import tempfile
    import zipfile

    with tempfile.TemporaryDirectory(prefix="vocab_zip_") as scratch:
        with zipfile.ZipFile(zip_path) as zf:
            names = [
                n
                for n in zf.namelist()
                if n.upper().endswith(".CSV") and not n.startswith(("/", ".."))
            ]
            zf.extractall(scratch, members=names)
        return import_vocabulary_dir(spark, warehouse, scratch, schemas)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSON-Lines scan with an explicit schema — the de-facto interchange
    format for LLM training corpora (one document object per line,
    usually .jsonl or .jsonl.gz; gzip is decoded transparently).

    Same rule as read_csv_typed: never inferSchema in a pipeline (a
    sampling pass over 100 TB of gzip is an extra full read).  Malformed
    lines land in ``_corrupt_record`` when ``keep_corrupt`` (route them
    to a quarantine sink); otherwise they are dropped (DROPMALFORMED),
    never a job failure mid-crawl.

    Note gzip is not splittable — one .jsonl.gz file = one task.  Shard
    the corpus into many files (the upstream crawler's natural output)
    or repartition right after the scan.
    """
    if keep_corrupt:
        full = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
        return spark.read.schema(full).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).json(path)
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
