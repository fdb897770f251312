"""JDBC source with pushed projection/casts and watermark predicate
(SURVEY §2.1 S1/S2, §2.10 I1).

Reference: Beam ``ReadFromJdbc`` with a generated SELECT
(`jobs/raw/dl_rw_job.py:59-66,89-96`) — full-table extracts every run, the
declared watermark columns unused. Here the TableSpec drives:
  - source-side projection + date→CHAR casts inside the pushed ``query``
    (Catalyst won't push arbitrary casts to JDBC, so we author them);
  - ``WHERE watermark > last`` pushed to the database (incremental reads);
  - partitioned parallel extraction via partitionColumn/numPartitions —
    required for any table that doesn't fit one executor's pipe.

No database ships in the test container, so this module is exercised by
unit tests through query *generation* plus a Derby/SQLite-less fake; the
read itself is a thin ``spark.read.format("jdbc")`` call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gcp_etl_pipeline_spark.spec import TableSpec


def read_jdbc(
    spark: SparkSession,
    url: str,
    spec: TableSpec,
    last_watermark: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``spec.source_table`` through JDBC with source-side projection,
    casts, and the watermark predicate."""
    query = spec.extraction_query(last_watermark)
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
