"""etl_sample_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-architecture of the capabilities of the
reference single-node pandas ETL (``ericoulster/ETL-Sample``,
``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py``): semi-structured
JSON document normalization into a star schema, plus the full relational
query surface (joins / aggregations / windows / set ops / scalar
functions), streaming ingest, and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md):
- DataFrame/SQL everywhere; Catalyst plans are the IR. No RDDs.
- Built-in ``pyspark.sql.functions`` on hot paths; Pandas UDFs only where
  built-ins cannot express the semantics.
- Every operator designed for 100 TB scale: broadcast small dims, pushed
  filters, partial aggregation, AQE for skew.
"""

from etl_sample_spark.session import get_spark, tune

__all__ = ["get_spark", "tune"]
__version__ = "0.1.0"
