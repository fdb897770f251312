"""TableSpec / type-ladder unit tests (SURVEY §1.3, §1.1.3)."""

from __future__ import annotations

from pyspark.sql import types as T

from gcp_etl_pipeline_spark.spec import ColumnSpec, TableSpec, sql_type_to_spark


def test_type_ladder_families():
    assert sql_type_to_spark("tinyint") == T.IntegerType()
    assert sql_type_to_spark("INT") == T.IntegerType()
    assert sql_type_to_spark("bigint") == T.LongType()
    assert sql_type_to_spark("float") == T.FloatType()
    # reference quirk preserved: decimal -> double (lossy)
    assert sql_type_to_spark("decimal(10,2)") == T.DoubleType()
    assert sql_type_to_spark("varchar(255)") == T.StringType()
    # date kinds ingest as string (CAST AS CHAR at source)
    assert sql_type_to_spark("datetime") == T.StringType()
    assert sql_type_to_spark("blob") == T.BinaryType()
    assert sql_type_to_spark("bit") == T.IntegerType()
    assert sql_type_to_spark("boolean") == T.BooleanType()
    # unknown -> string fallback
    assert sql_type_to_spark("geometry") == T.StringType()


def _spec() -> TableSpec:
    return TableSpec(
        name="raw.gosales_daily_sales",
        columns=(
            ColumnSpec("id", "bigint"),
            ColumnSpec("sale_date", "date"),
            ColumnSpec("quantity", "int"),
            ColumnSpec("unit_price", "float"),
        ),
        merge_columns=("id",),
        watermark_column="sale_date",
        source_table="gosales.go_daily_sales",
    )


def test_struct_type_roundtrip():
    st = _spec().struct_type()
    assert [f.name for f in st.fields] == ["id", "sale_date", "quantity", "unit_price"]
    assert st["sale_date"].dataType == T.StringType()
    assert st["unit_price"].dataType == T.FloatType()


def test_extraction_query_casts_dates_and_pushes_watermark():
    q = _spec().extraction_query(last_watermark="2024-01-01")
    assert "CAST(sale_date AS CHAR) AS sale_date" in q
    assert "FROM gosales.go_daily_sales" in q
    assert "WHERE sale_date > '2024-01-01'" in q
    # no watermark -> full extract, no WHERE
    assert "WHERE" not in _spec().extraction_query()
