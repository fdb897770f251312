"""Runtime JDBC tests (S1/I1) against embedded Derby — the JDBC driver
Spark itself ships for its Hive metastore, so no external database is
needed. Covers the pushed projection query, the watermark predicate, and
partitioned parallel extraction.

Derby notes: unquoted identifiers uppercase (the test uses uppercase
names so Spark's quoted DDL matches the spec's unquoted query), and
string columns must be created as VARCHAR (Spark's default CLOB mapping
cannot be compared)."""

from __future__ import annotations

import pytest

from gcp_etl_pipeline_spark.sources.jdbc import read_jdbc
from gcp_etl_pipeline_spark.spec import ColumnSpec, TableSpec

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("derby")
    url = f"jdbc:derby:{d}/db;create=true"
    src = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0, "x"),
            (2, "2024-01-02", 20.0, "y"),
            (3, "2024-01-03", 30.0, "z"),
            (4, "2024-01-04", 40.0, "w"),
        ],
        ["ID", "SALE_DATE", "AMOUNT", "NOTE"],
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "SALES")
        .option("driver", DRIVER)
        .option(
            "createTableColumnTypes",
            "ID BIGINT, SALE_DATE VARCHAR(10), AMOUNT DOUBLE, NOTE VARCHAR(5)",
        )
        .save()
    )
    return url


@pytest.fixture()
def spec() -> TableSpec:
    return TableSpec(
        name="raw.sales",
        columns=(
            ColumnSpec("ID", "bigint"),
            ColumnSpec("SALE_DATE", "varchar(10)"),
            ColumnSpec("AMOUNT", "double"),
        ),
        watermark_column="SALE_DATE",
        source_table="SALES",
    )


def test_jdbc_projection_pushdown(spark, derby, spec):
    out = read_jdbc(spark, derby, spec, driver=DRIVER)
    # NOTE is not in the contract -> never leaves the database
    assert out.columns == ["ID", "SALE_DATE", "AMOUNT"]
    assert out.count() == 4


def test_jdbc_watermark_predicate(spark, derby, spec):
    out = read_jdbc(spark, derby, spec, last_watermark="2024-01-02", driver=DRIVER)
    assert sorted(r.ID for r in out.collect()) == [3, 4]


def test_jdbc_partitioned_parallel_read(spark, derby, spec):
    out = read_jdbc(
        spark, derby, spec,
        partition_column="ID", lower_bound=1, upper_bound=5, num_partitions=2,
        driver=DRIVER,
    )
    assert out.rdd.getNumPartitions() == 2
    assert sorted(r.ID for r in out.collect()) == [1, 2, 3, 4]


def test_jdbc_partitioned_with_watermark(spark, derby, spec):
    out = read_jdbc(
        spark, derby, spec, last_watermark="2024-01-01",
        partition_column="ID", lower_bound=1, upper_bound=5, num_partitions=2,
        driver=DRIVER,
    )
    assert sorted(r.ID for r in out.collect()) == [2, 3, 4]
