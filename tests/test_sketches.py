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


def test_kll_quantiles_within_rank_error(spark, sf_dir):
    """Sketch median must land between the exact p40 and p60 values
    (k=200 → ~1.65% rank error; 10% rank margin is >>5 sigma)."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    from gcp_etl_pipeline_spark.operators.sketches import (
        kll_partials,
        kll_quantiles,
    )

    batches = [
        li.where(F.pmod(F.col("l_orderkey"), F.lit(3)) == i) for i in range(3)
    ]
    partials = batches[0].transform(
        lambda d: kll_partials(d, ["l_returnflag"], "l_extendedprice")
    )
    for b in batches[1:]:
        partials = partials.unionByName(
            kll_partials(b, ["l_returnflag"], "l_extendedprice")
        )
    got = {
        r.l_returnflag: r.q50
        for r in kll_quantiles(partials, ["l_returnflag"], [0.5]).collect()
    }
    bounds = {
        r.l_returnflag: (r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.40)").alias("lo"),
            F.expr("percentile(l_extendedprice, 0.60)").alias("hi"),
        )
        .collect()
    }
    assert got.keys() == bounds.keys()
    for k, (lo, hi) in bounds.items():
        assert lo <= got[k] <= hi, (k, got[k], lo, hi)


def test_theta_set_estimates_exact_below_k(spark, sf_dir):
    """At cardinalities below the sketch's k (4096), Theta retains every
    hash, so union/intersection/difference estimates are EXACT."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    from gcp_etl_pipeline_spark.operators.sketches import (
        theta_partials,
        theta_set_estimates,
    )

    seg_a = li.where("l_returnflag = 'R'")
    seg_b = li.where("l_linestatus = 'F'")
    a = theta_partials(seg_a.withColumn("g", F.lit(1)), ["g"], "l_partkey")
    b = theta_partials(seg_b.withColumn("g", F.lit(1)), ["g"], "l_partkey")
    got = theta_set_estimates(a, b, ["g"]).collect()[0]

    pa = {r.l_partkey for r in seg_a.select("l_partkey").distinct().collect()}
    pb = {r.l_partkey for r in seg_b.select("l_partkey").distinct().collect()}
    assert len(pa) < 4096 and len(pb) < 4096  # precondition for exactness
    assert got.union_distinct == len(pa | pb)
    assert got.intersect_distinct == len(pa & pb)
    assert got.diff_distinct == len(pa - pb)


def test_theta_partial_merge_matches_direct(spark, sf_dir):
    """Per-batch Theta partials merged == one-shot sketch (union is
    set-deterministic)."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    from gcp_etl_pipeline_spark.operators.sketches import (
        theta_partials,
        theta_union_estimate,
    )

    partials = None
    for i in range(3):
        p = theta_partials(
            li.where(F.pmod(F.col("l_orderkey"), F.lit(3)) == i),
            ["l_returnflag"],
            "l_partkey",
        )
        partials = p if partials is None else partials.unionByName(p)
    merged = {
        r.l_returnflag: r.approx_distinct
        for r in theta_union_estimate(partials, ["l_returnflag"]).collect()
    }
    direct = {
        r.l_returnflag: r.approx_distinct
        for r in theta_union_estimate(
            theta_partials(li, ["l_returnflag"], "l_partkey"), ["l_returnflag"]
        ).collect()
    }
    assert merged == direct
