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


from gcp_etl_pipeline_spark.spec import ColumnSpec, TableSpec

# EP1 ingestion contract for the daily-sales feed (reference
# `jobs/raw/mysql_to_gcs_parquet.py:38-60`): date stringified at source,
# watermark-driven increments, retailer code masked at rest.
DAILY_SALES_SPEC = TableSpec(
    name="raw.go_daily_sales",
    columns=(
        ColumnSpec("retailer_code", "varchar(32)"),
        ColumnSpec("product_number", "varchar(32)"),
        ColumnSpec("order_method_code", "varchar(32)"),
        ColumnSpec("sale_date", "date"),
        ColumnSpec("quantity", "double"),
        ColumnSpec("unit_price", "double"),
        ColumnSpec("unit_sale_price", "double"),
    ),
    watermark_column="sale_date",
    masking_columns=("retailer_code",),
)


def build_pipeline(sf_dir: str, warehouse: str, spark: SparkSession) -> Pipeline:
    p = Pipeline(spark, ledger_path=f"{warehouse}/ops/run_log")

    # ---------------------------------------------------------- raw layer
    # EP1: contract-driven ingest — string hygiene, spec casts, masked
    # column, audit stamps, watermark-incremental append + metadata update.
    def build_raw(spark: SparkSession, ctx: RunContext) -> DataFrame:
        from gcp_etl_pipeline_spark.operators import expectations as ex
        from gcp_etl_pipeline_spark.operators.masking import mask_columns
        from gcp_etl_pipeline_spark.operators.normalize import (
            cast_to_spec,
            normalize_strings,
        )

        df = gosales.go_daily_sales(spark, sf_dir)
        df = cast_to_spec(normalize_strings(df), DAILY_SALES_SPEC)
        # contract gate BEFORE masking: rows violating the TableSpec's
        # implied rules route to the quarantine sink with provenance;
        # only the clean split continues into the raw table
        df = ex.enforce_to_quarantine(
            df,
            ex.from_spec(DAILY_SALES_SPEC),
            f"{warehouse}/quarantine/go_daily_sales",
            batch_id=ctx.batch_id,
        )
        key = ctx.params.get("mask_key", "0123456789abcdef")
        df = mask_columns(df, list(DAILY_SALES_SPEC.masking_columns), key)
        return _audited(df, ctx, 100)

    def write_raw(df: DataFrame, spark: SparkSession, ctx: RunContext) -> int:
        from gcp_etl_pipeline_spark.sources.incremental_ingest import (
            IngestionCatalog,
            ingest_incremental,
        )

        cat = IngestionCatalog(spark, f"{warehouse}/ops/ingestion_metadata")
        return ingest_incremental(
            DAILY_SALES_SPEC, df, f"{warehouse}/raw/go_daily_sales", cat
        )

    p.add(
        Job(
            name="raw_go_daily_sales", layer="RAW", build=build_raw,
            write=write_raw, table_name="go_daily_sales",
        )
    )

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
        # Backfill support (reference argv parity: optional start_date /
        # end_date bounds, `jobs/raw/dl_rw_job.py:127-134`). The rebuild
        # window is WIDENED to whole months — the fact's partition grain —
        # because dynamic overwrite replaces entire sale_month partitions:
        # filtering on the raw dates would silently drop the out-of-range
        # rows of a partially-covered month when its partition is
        # rewritten. Untouched months keep their rows and original batch
        # stamps. sale_date is the reference's stringified yyyy-MM-dd, so
        # string prefix comparison IS month comparison.
        df = gosales.sales_fact(spark, sf_dir)
        start = ctx.params.get("start_date")
        end = ctx.params.get("end_date")
        month = F.substring("sale_date", 1, 7)
        if start:
            df = df.where(month >= start[:7])
        if end:
            df = df.where(month <= end[:7])
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
    # plan-owned cleanup: release THIS app's persisted dims and the
    # quarantine gate's flagged-projection cache after each run (the good
    # split reads that cache through the raw write, so release must wait
    # for the run to finish)
    def _cleanup(spark: SparkSession) -> None:
        from gcp_etl_pipeline_spark.operators.expectations import (
            release_quarantine_caches,
        )

        gosales.clear_dim_cache(spark)
        release_quarantine_caches(spark)

    p.on_finish(_cleanup)
    return p
