"""Catalog-namespace layer (SURVEY §1.1.1): managed layer databases,
saveAsTable writes, spark.table reads, external registration of
path-written warehouse tables."""

from __future__ import annotations

from gcp_etl_pipeline_spark.sinks import catalog

SF = "/root/testdata/sf0.001"


def test_namespaces_and_managed_roundtrip(spark, tmp_path):
    catalog.ensure_namespaces(spark, str(tmp_path / "wh"))
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert {"raw", "curated", "semantic", "ops"} <= dbs
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    catalog.save_table(df, "curated.t_roundtrip")
    back = spark.table("curated.t_roundtrip")
    assert back.count() == 10
    # overwrite is truncate-and-insert (K5), not append
    catalog.save_table(df.where("id < 3"), "curated.t_roundtrip")
    assert spark.table("curated.t_roundtrip").count() == 3
    spark.sql("DROP TABLE curated.t_roundtrip")


def test_gosales_catalog_matches_inline_overview(spark, tmp_path):
    """The catalog-routed vertical must be result-identical to the inline
    plan (same oracle grades both)."""
    from gcp_etl_pipeline_spark.plans import gosales

    out = catalog.run_gosales_catalog(spark, SF, str(tmp_path / "wh"))
    inline = gosales.sales_overview(spark, SF)
    key = lambda r: tuple(str(x) for x in r)
    assert sorted(map(key, out.collect())) == sorted(map(key, inline.collect()))


def test_register_external_over_pipeline_warehouse(spark, tmp_path):
    """Path-writing jobs and catalog readers compose: a parquet dir some
    other job wrote becomes a spark.table-addressable external table, and
    DROP TABLE leaves the data."""
    import os

    p = str(tmp_path / "ext" / "sales")
    spark.range(50).selectExpr("id AS k", "'x' AS s").write.parquet(p)
    catalog.ensure_namespaces(spark, str(tmp_path / "wh"))
    catalog.register_external(spark, "curated.ext_sales", p)
    assert spark.table("curated.ext_sales").count() == 50
    assert spark.sql("SELECT COUNT(*) AS n FROM curated.ext_sales").first().n == 50
    spark.sql("DROP TABLE curated.ext_sales")
    assert os.path.isdir(p)  # external: data survives DROP
