"""Connected components and data-quality operator semantics."""

from __future__ import annotations


def test_components_basic_clusters_and_singleton(spark):
    from gcp_etl_pipeline_spark.operators.components import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "node long")
    # chain 1-2-3, pair 5-6, singletons 4 and 7
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6)], "src long, dst long"
    )
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_components_long_chain_converges(spark):
    from gcp_etl_pipeline_spark.operators.components import (
        connected_components,
    )

    n = 12  # diameter 11: exercises multi-round propagation
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = connected_components(nodes, edges)
    assert {r.component for r in got.collect()} == {0}


def test_profile_counts_nulls_and_distincts(spark):
    from gcp_etl_pipeline_spark.operators.quality import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "k long, v string"
    )
    got = {r.col_name: r for r in profile(df).collect()}
    assert got["k"].n_rows == 3 and got["k"].n_null == 0
    assert got["k"].n_distinct == 3
    assert got["v"].n_null == 1 and got["v"].n_distinct == 1
    assert got["v"].min_value == "a" and got["v"].max_value == "a"


def test_validate_null_predicate_counts_as_violation(spark):
    from gcp_etl_pipeline_spark.operators.quality import validate

    df = spark.createDataFrame([(1,), (None,), (-2,)], "x int")
    got = {
        r.rule: r.n_violations
        for r in validate(df, {"x_pos": "x > 0"}).collect()
    }
    assert got == {"x_pos": 2}  # NULL and -2 both violate
