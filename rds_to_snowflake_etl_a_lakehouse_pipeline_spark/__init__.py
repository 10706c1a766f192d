"""lakeflow — a PySpark-native analytics/ETL engine.

Brand-new implementation of the query and data-processing capabilities of
the reference repo ``kalpitdamahe/RDS-to-Snowflake-ETL-A-Lakehouse-Pipeline``
(a medallion bronze→silver→gold lakehouse ETL on AWS Glue), re-expressed
Spark-first:

- ``functions``  — scalar cleansing/repair rules (SURVEY.md §2.10 R1–R12),
  text analysis, vector math. Pure ``DataFrame -> DataFrame`` / ``Column``
  builders compiled to Catalyst expressions (no Python UDFs in hot paths).
- ``operators``  — relational operators: windowed dedup, SCD-2 close,
  surrogate keys (reference-faithful and scale-safe), star joins,
  aggregation surface, dedup (exact/MinHash-LSH/SimHash/Jaccard/
  connected-component), similarity search (brute-force + LSH/IVF ANN),
  corpus curation (sequence packing, stratified sampling, per-group
  top-k, mixture reweighting).
- ``sources``    — readers (parquet/csv/json/jdbc) and sinks (parquet
  table, warehouse/Snowflake-shaped) behind one interface.
- ``plans``      — the medallion pipeline (bronze/silver/gold builders for
  the CRM/ERP star schema), a topological DAG runner, and DQ gates built
  on ``df.observe()``.
- ``streaming``  — event-time windowed analytics (tumbling/sliding/
  session), batch-first with Structured-Streaming twins.
- ``maintenance`` — one-call health sweep + runbook over every standing
  surface (indexes, state tables, batch sinks, versioned tables).

Everything is DataFrame-API-first so Catalyst/AQE does the optimizing:
predicate pushdown, column pruning, broadcast selection, AQE skew handling.
Designed for a 1000-executor cluster at ~100 TB; tested on local[32].
"""

__version__ = "0.1.0"
