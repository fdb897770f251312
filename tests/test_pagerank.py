"""PageRank: known-graph sanity, partitioning-invariance of the integer
recurrence (the property that motivates it), and mass conservation."""

from __future__ import annotations

from gcp_etl_pipeline_spark.operators.pagerank import SCALE, pagerank


def _ranks(spark, edges, parts, iterations=3):
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(parts)
    return {
        r.node: r.pr_u for r in pagerank(df, iterations=iterations).collect()
    }


def test_symmetric_pair_equal_ranks(spark):
    got = _ranks(spark, [("a", "b"), ("b", "a")], parts=2)
    assert got["a"] == got["b"]


def test_star_hub_dominates(spark):
    leaves = [f"l{i}" for i in range(6)]
    edges = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    got = _ranks(spark, edges, parts=3)
    assert all(got["hub"] > got[l] for l in leaves)
    assert len(set(got[l] for l in leaves)) == 1  # leaves symmetric


def test_partitioning_invariant(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")]
    assert _ranks(spark, edges, parts=1) == _ranks(spark, edges, parts=5)


def test_mass_bounded(spark):
    # floor divisions only ever drop mass: total stays within N·ulp of
    # SCALE from below, never above
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _ranks(spark, edges, parts=2)
    assert sum(got.values()) <= SCALE
    assert sum(got.values()) > SCALE - 100 * len(got)
