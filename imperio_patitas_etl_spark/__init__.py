"""imperio_patitas_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL service (``Eme087/imperio-patitas-etl``): entity
extract/validate/transform/load pipelines, idempotent keyed upserts,
incremental trailing-window loads, plus the large-scale data-pipeline
operators (dedup, similarity search, text analysis) a 100 TB training-data
pipeline needs.

Design principles
-----------------
- DataFrame/SQL only; Catalyst plans everything. No RDDs.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where Spark genuinely lacks the semantics (none needed for fidelity).
- Broadcast small dimensions, partition facts by date, let AQE handle skew.
"""

__version__ = "0.1.0"
