"""HLL distinct-count sketches: accuracy vs exact, and lossless
mergeability of per-batch partials (the incremental-maintenance
property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_partials,
)
from gcp_etl_pipeline_spark.sources.files import read_parquet


def test_hll_estimate_within_error_bound(spark, sf_dir):
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    approx = {
        r.l_returnflag: r.approx_distinct
        for r in hll_estimate(li, ["l_returnflag"], "l_partkey").collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # lgk=14 → ~0.8% standard error; 3% is >3 sigma
        assert abs(approx[k] - n) <= max(3, 0.03 * n), (k, approx[k], n)


def test_hll_partials_merge_losslessly(spark, sf_dir):
    """Sketching batches then merging == sketching the union directly —
    per-register max is exact, so incremental maintenance loses nothing."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    batches = [
        li.where(F.pmod(F.col("l_orderkey"), F.lit(3)) == i) for i in range(3)
    ]
    partials = None
    for b in batches:
        p = hll_partials(b, ["l_returnflag"], "l_partkey")
        partials = p if partials is None else partials.unionByName(p)
    merged = {
        r.l_returnflag: r.approx_distinct
        for r in hll_merge(partials, ["l_returnflag"]).collect()
    }
    direct = {
        r.l_returnflag: r.approx_distinct
        for r in hll_estimate(li, ["l_returnflag"], "l_partkey").collect()
    }
    assert merged == direct


def test_hll_plan_is_two_phase_no_distinct_expand(spark, sf_dir):
    """The sketch aggregate must be partial->final (map-side combined);
    the shuffle carries KB sketches, not distinct values."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    df = hll_estimate(li, ["l_returnflag"], "l_partkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") == 2, plan
    assert "Expand" not in plan, plan
