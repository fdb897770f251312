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


def test_neardup_transitive_keeps_component_minima(spark):
    """The kept set must be exactly one minimum-id representative per
    near-dup cluster — consistent with the components assignment, and a
    CHAIN (A~B, B~C) collapses to one keeper even if A and C never
    collide directly."""
    from gcp_etl_pipeline_spark.operators import dedup
    from gcp_etl_pipeline_spark.operators.components import (
        connected_components,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "the quick brown fox jumps over the lazy cat today"),
            (4, "completely different text about spark physical plans"),
        ],
        ["doc_id", "text"],
    )
    kept = {r.doc_id for r in dedup.dedup_neardup_transitive(docs).collect()}
    pairs = dedup.simhash_neardup_pairs(docs)
    comp = connected_components(
        docs.select(F.col("doc_id").alias("node")),
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
    )
    expected = {
        r.component for r in comp.select("component").distinct().collect()
    }
    assert kept == expected
    assert 1 in kept and 4 in kept and 2 not in kept  # exact dups collapse


def test_boilerplate_ngrams_ranks_by_document_frequency(spark):
    from gcp_etl_pipeline_spark.operators.dedup import boilerplate_ngrams

    docs = spark.createDataFrame(
        [
            (1, "shared header text plus alpha"),
            (2, "shared header text plus beta"),
            (3, "shared header text plus gamma"),
            (4, "totally unrelated words here now"),
        ],
        ["doc_id", "text"],
    )
    top = boilerplate_ngrams(docs, top_k=3).collect()
    # the three boilerplate shingles all have df=3 ("shared header text",
    # "header text plus", "text plus <x>" varies per doc so df=1);
    # ties break lexicographically: 'header...' < 'shared...'
    assert [(r.shingle, r.n_docs) for r in top[:2]] == [
        ("header text plus", 3),
        ("shared header text", 3),
    ]
    assert top[2].n_docs == 1  # the df=1 tail starts at rank 3
