"""Runtime Bloom-filter join pruning: with a selective dimension filter,
Spark should inject a bloom_filter_agg on the dim side and a
might_contain pre-filter on the fact scan — rows that can't join are
dropped BEFORE the shuffle. At 100 TB this is the difference between
shuffling the whole fact table and shuffling the ~matching fraction;
session.py enables the optimizer flag, and the thresholds here only
shrink Spark's size gates so the tiny fixture triggers the same rewrite
a real fact table would."""

from __future__ import annotations

import pytest

from gcp_etl_pipeline_spark.sources.files import read_parquet

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@pytest.fixture
def bloom_confs(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_join_gets_bloom_prefilter(spark, sf_dir, bloom_confs):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan
    # the pre-filter must land on the FACT side scan (l_orderkey probe)
    assert "might_contain" in plan.split("Join")[1].split(":-")[1]


def test_bloom_filtered_join_matches_unfiltered(spark, sf_dir, bloom_confs):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    with_bloom = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert with_bloom == without
