"""The GoSales vertical as a MATERIALIZED pipeline: the reference's full
build order (`composer/goSalesPipeline.py:23-29`) writing real tables into
a warehouse directory through the engine's Pipeline runner + run ledger.

Physical design (the decisions the reference left latent, SURVEY §4):
  - helpings/lookup/dim maintenance is insert-new-only against the WRITTEN
    target (idempotent re-runs; reference `mode("append")` + anti-join);
  - the fact is a full-refresh overwrite PARTITIONED BY sale month, so
    dynamic partition overwrite replaces only touched months and every
    downstream date-filtered scan prunes partitions;
  - the semantic overview is truncate-insert (overwrite), the reference K5.

Audit columns are stamped with the ctx batch_id; ``batch_ts`` in
ctx.params pins timestamps for deterministic tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators.audit import add_audit_columns
from gcp_etl_pipeline_spark.pipeline import Job, Pipeline, RunContext
from gcp_etl_pipeline_spark.plans import gosales
from gcp_etl_pipeline_spark.sinks.writers import insert_new_rows, write_parquet

LAYER_CURATED = "curated"
LAYER_SEMANTIC = "SEMANTIC"


def _audited(df: DataFrame, ctx: RunContext, table_id: int) -> DataFrame:
    return add_audit_columns(
        df,
        batch_id=ctx.batch_id,
        source="gosales",
        table_id=table_id,
        batch_ts=ctx.params.get("batch_ts"),
    )


def build_pipeline(sf_dir: str, warehouse: str, spark: SparkSession) -> Pipeline:
    p = Pipeline(spark, ledger_path=f"{warehouse}/ops/run_log")

    def maintenance_job(
        name: str, table_id: int, stage_fn, keys: list[str], deps: tuple[str, ...] = ()
    ) -> Job:
        def build(spark: SparkSession, ctx: RunContext) -> DataFrame:
            return _audited(stage_fn(spark, sf_dir), ctx, table_id)

        def write(df: DataFrame, spark: SparkSession, ctx: RunContext) -> int:
            return insert_new_rows(df, f"{warehouse}/curated/{name}", keys)

        return Job(name=name, layer=LAYER_CURATED, build=build, write=write,
                   table_name=name, depends_on=deps)

    p.add(maintenance_job("method_hlp", 101, gosales.method_hlp, ["method_name"]))
    p.add(maintenance_job("retailer_hlp", 102, gosales.retailer_hlp, ["retailer_code"]))
    p.add(
        maintenance_job(
            "product_lkp", 103, gosales.product_lkp, ["product_number"]
        )
    )
    p.add(
        maintenance_job(
            "retailer_dim", 104, gosales.retailer_dim, ["retailer_key"],
            deps=("retailer_hlp",),
        )
    )

    def build_fact(spark: SparkSession, ctx: RunContext) -> DataFrame:
        df = gosales.sales_fact(spark, sf_dir)
        return _audited(df, ctx, 105).withColumn(
            "sale_month", F.substring("sale_date", 1, 7)
        )

    def write_fact(df: DataFrame, spark: SparkSession, ctx: RunContext) -> None:
        # dynamic partition overwrite: only months present in df are replaced
        write_parquet(
            df, f"{warehouse}/curated/sales_fact", mode="overwrite",
            partition_by=["sale_month"],
        )
        return None  # runner counts

    p.add(
        Job(
            name="sales_fact", layer=LAYER_CURATED, build=build_fact,
            write=write_fact, table_name="sales_fact",
            depends_on=("method_hlp", "retailer_hlp", "product_lkp"),
        )
    )

    def build_overview(spark: SparkSession, ctx: RunContext) -> DataFrame:
        return _audited(gosales.sales_overview(spark, sf_dir), ctx, 106)

    def write_overview(df: DataFrame, spark: SparkSession, ctx: RunContext) -> None:
        write_parquet(df, f"{warehouse}/semantic/tl_sales_overview", mode="overwrite")
        return None

    p.add(
        Job(
            name="tl_sales_overview", layer=LAYER_SEMANTIC, build=build_overview,
            write=write_overview, table_name="tl_sales_overview",
            depends_on=("sales_fact", "retailer_dim"),
        )
    )
    return p
