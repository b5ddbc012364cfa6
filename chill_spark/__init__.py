"""chill_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
the reference ETL/reconciliation harness (xneyder/Chill), re-expressed
Spark-first: declarative DataFrame/SQL plans, Catalyst optimization,
partition-aware writes, and distributed reconciliation — plus
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layers (see SURVEY.md §0):
  - catalog/   metadata catalog: tables, schemas, keys, granularity ladder
  - config/    job-spec model (field-derivation DSL declarations)
  - dsl/       expression compiler: config templates -> Spark Columns
  - sources/   csv/parquet/stream sources, per-file preprocessor
  - operators/ project/derive/route/rollup/retention/writers
  - reconcile/ expected-vs-actual data diff (anti-joins, tolerant diff)
  - report/    JUnit XML report model + the five reconciliation suites
  - llm_ops/   dedup, similarity search, text analysis, multimodal
  - streaming/ Structured Streaming equivalents of the batch pipeline
"""

__version__ = "0.1.0"
