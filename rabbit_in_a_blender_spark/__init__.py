"""rabbit_in_a_blender_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of RADar-AZDelta/Rabbit-in-a-Blender (an OMOP-CDM ETL engine
driven by Jinja SQL templates over BigQuery / SQL Server), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, streaming) that a 100 TB Spark
deployment needs.

Layout
------
core/       SparkSession factory, schema registry, IO helpers
operators/  the SURVEY §2 parity operators as composable DataFrame helpers
functions/  scalar-function helpers (SURVEY §2.H)
sources/    readers for CSV/TSV/Parquet with explicit schemas (§2.A)
plans/      the query catalog: named queries + DuckDB oracle SQL
mapping/    the RiaB mapping engine (usagi, swap tables, events) re-expressed
pipeline/   FK toposort + two-stage run loop
quality/    DQD-style data-quality checks + Achilles-style statistics
streaming/  Structured-Streaming extensions (batch-checkable)
ext/        dedup / similarity / text / multimodal extension operators

Nothing here is a port: the reference tells us WHAT to compute (see
/root/repo/SURVEY.md); the HOW is idiomatic PySpark DataFrame/SQL.
"""

__version__ = "0.2.0"  # kept in sync with pyproject.toml
