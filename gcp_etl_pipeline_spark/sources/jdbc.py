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

Runtime-tested against embedded Derby (the JDBC driver Spark ships for
its Hive metastore): tests/test_jdbc.py covers projection pushdown, the
watermark predicate, and partitioned parallel extraction end to end.
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
    reader = spark.read.format("jdbc").option("url", url)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        # Spark rejects 'query' + partitionColumn; the pushed query rides
        # as a derived-table dbtable instead (same source-side execution)
        reader = (
            reader.option("dbtable", f"({query}) SPARK_GRAFT_SUBQ")
            .option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    else:
        reader = reader.option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
