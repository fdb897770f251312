"""Bucketed co-located join: the join of two same-bucketed tables must
run with NO shuffle exchange — the at-scale point of bucketing."""

from __future__ import annotations

import pytest

from gcp_etl_pipeline_spark.sinks.writers import write_bucketed_table
from gcp_etl_pipeline_spark.sources.files import read_parquet


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("buckets")
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    lineitem = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed_table(
        orders, "bkt_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(wh / "orders"),
    )
    write_bucketed_table(
        lineitem, "bkt_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(wh / "lineitem"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # at fixture scale Catalyst would (correctly) broadcast; disable it to
    # exercise the large-x-large case bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"),
            spark.table("bkt_lineitem").l_orderkey
            == spark.table("bkt_orders").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed):
    joined = spark.table("bkt_lineitem").join(
        spark.table("bkt_orders"),
        spark.table("bkt_lineitem").l_orderkey
        == spark.table("bkt_orders").o_orderkey,
    )
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    assert joined.count() == li.count()  # every lineitem has its order
