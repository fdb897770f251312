"""Edge-contract tests for the round-6 corpus-audit operators: KMV
cardinality sketch, weighted priority sampling, mutual-kNN graph,
source overlap, shingle novelty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_etl_pipeline_spark.operators.curation import weighted_priority_sample
from gcp_etl_pipeline_spark.operators.dedup import shingle_novelty, source_overlap
from gcp_etl_pipeline_spark.operators.similarity import mutual_knn
from gcp_etl_pipeline_spark.operators.sketches import kmv_distinct


# ----------------------------------------------------------- kmv_distinct

def test_kmv_exact_below_k(spark):
    vals = spark.createDataFrame([(f"v{i}",) for i in range(10)] * 3, ["v"])
    row = kmv_distinct(vals, "v", k=64).collect()[0]
    assert row.n_retained == 10
    assert row.est_distinct == 10 == row.exact_distinct
    assert row.err_u == 0


def test_kmv_estimates_above_k(spark):
    vals = spark.createDataFrame([(f"v{i}",) for i in range(2000)], ["v"])
    row = kmv_distinct(vals, "v", k=128).collect()[0]
    assert row.n_retained == 128
    assert row.exact_distinct == 2000
    # KMV standard error ~ 1/sqrt(k-2) ≈ 9%; assert a loose 3-sigma band
    assert abs(row.est_distinct - 2000) < 2000 * 0.3
    assert row.err_u == abs(row.est_distinct - 2000) * 1_000_000 // 2000


def test_kmv_insensitive_to_duplication(spark):
    base = [(f"v{i}",) for i in range(500)]
    once = spark.createDataFrame(base, ["v"])
    many = spark.createDataFrame(base * 7, ["v"])
    assert (
        kmv_distinct(once, "v", k=64).collect()[0].est_distinct
        == kmv_distinct(many, "v", k=64).collect()[0].est_distinct
    )


# ---------------------------------------------- weighted_priority_sample

def _wps_input(spark, n=400):
    # half weight 1, half weight 8, one stratum
    rows = [("s", i, 1 if i % 2 == 0 else 8) for i in range(n)]
    return spark.createDataFrame(rows, ["g", "k", "w"])


def test_wps_heavier_rows_overrepresented(spark):
    out = weighted_priority_sample(
        _wps_input(spark), "g", "k", "w", k=50
    ).collect()
    assert len(out) == 50
    heavy = sum(1 for r in out if r.w == 8)
    # E[heavy] ≈ 50·8/9 ≈ 44; the draw is deterministic, assert a wide band
    assert heavy > 30


def test_wps_deterministic_and_layout_invariant(spark):
    df = _wps_input(spark)
    a = {(r.g, r.k) for r in weighted_priority_sample(df, "g", "k", "w", k=20).collect()}
    b = {
        (r.g, r.k)
        for r in weighted_priority_sample(
            df.repartition(13, "w"), "g", "k", "w", k=20
        ).collect()
    }
    assert a == b


def test_wps_rejects_non_divisor_weight(spark):
    bad = spark.createDataFrame([("s", 1, 11)], ["g", "k", "w"])
    with pytest.raises(Exception, match="divisor"):
        weighted_priority_sample(bad, "g", "k", "w", k=5).collect()


# ------------------------------------------------------------- mutual_knn

def test_mutual_knn_requires_both_directions(spark):
    # three tight vectors + one outlier whose nearest is the cluster but
    # not vice versa at k=1: outlier edges must be dropped
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.98, 0.2]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r.a, r.b) for r in mutual_knn(df, k=1).collect()}
    assert pairs == {(1, 2), (3, 4)}


def test_mutual_knn_pairs_are_ordered(spark):
    rows = [(i, [float(i % 3 == j) for j in range(3)]) for i in range(9)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = mutual_knn(df, k=3).collect()
    assert all(r.a < r.b for r in out)


# ---------------------------------------------------------- source_overlap

def test_source_overlap_identical_sources_full_jaccard(spark):
    rows = [
        (1, "alpha beta gamma delta", "A"),
        (2, "alpha beta gamma delta", "B"),
        (3, "zeta eta theta iota", "C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r.src_a, r.src_b): r for r in source_overlap(df).collect()}
    assert set(out) == {("A", "B")}  # C shares nothing → absent
    r = out[("A", "B")]
    assert r.inter == r.n_a == r.n_b == 2  # two 3-gram shingles each
    assert r.jaccard_u == 1_000_000


# --------------------------------------------------------- shingle_novelty

def test_shingle_novelty_first_doc_fully_novel(spark):
    rows = [
        (1, "a b c d"),          # shingles: "a b c", "b c d" — all novel
        (2, "a b c d"),          # exact repeat — nothing novel
        (3, "a b c x y z"),      # "a b c" seen; 3 of 4 novel
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in shingle_novelty(df).collect()}
    assert out[1].n_novel == out[1].n_shingles == 2
    assert out[1].novelty_u == 1_000_000
    assert out[2].n_novel == 0 and out[2].novelty_u == 0
    assert (out[3].n_shingles, out[3].n_novel) == (4, 3)
    assert out[3].novelty_u == 750_000


def test_shingle_novelty_short_docs_absent(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "a b c")], ["doc_id", "text"])
    out = {r.doc_id for r in shingle_novelty(df).collect()}
    assert out == {2}
