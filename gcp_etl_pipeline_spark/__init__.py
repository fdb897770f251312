"""gcp_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
the reference GCP medallion ETL pipeline (``usmangcpcloude/gcp-etl-pipeline``),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, with a
small operator library for the reference's recurring semantics (surrogate
keys, insert-new-only maintenance, star joins, audit columns, masking) plus
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layers (reference: medallion raw/curated/semantic; SURVEY.md §1.1):
    raw      — typed ingestion of external sources
    curated  — star schema (helpings / lookups / dimensions / facts)
    semantic — denormalized aggregates ("thin layer")
"""

from gcp_etl_pipeline_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
