"""Similarity search over embedding columns (array<float>).

Two paths:
  - ``knn_bruteforce``: exact top-k cosine for a (small, broadcast) query
    set against the full corpus — the correctness baseline. Scales
    linearly in corpus size with zero shuffle of the corpus (queries are
    broadcast; the window for top-k partitions by query id).
  - ``neardup_pairs_bucketed``: all-pairs cosine ≥ threshold via sign-bit
    LSH bucketing (deterministic md5-derived hyperplanes), so candidate
    generation is a bucket equi-join instead of O(n²); brute-force
    verification only inside buckets.

Determinism contract: components are quantized to µ-units (round(x*1e6)
as bigint) before any dot product, so similarity values are exact integer
math + one final division — identical on any engine, any partitioning,
any parallelism (and differential-testable against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _q(x: Column) -> Column:
    """Quantize one component: float -> exact µ-unit bigint."""
    return F.round(x.cast("double") * MICRO, 0).cast("long")


def _qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _q(x) * _q(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _qnorm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: _q(x) * _q(x)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    """Quantized cosine similarity (double), deterministic cross-engine."""
    return _qdot(a, b) / (_qnorm(a) * _qnorm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries``: (query_id, embedding) — small; broadcast against the
    corpus scan. Ties broken by corpus id for determinism."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__qvec"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
        .select(query_id_col, "neighbor_id", "cos_sim", "rn")
    )


def _hyperplane_sign(vec: Column, plane_id: int) -> Column:
    """Sign bit of ⟨vec, plane⟩ for a deterministic pseudo-random
    hyperplane: component d of plane p has integer weight
    2*md5_nibble(p|d) - 15 ∈ {-15..15}, always odd. Quantized components
    × integer weights keep the vote sum exact, so the sign (and thus the
    bucket) is identical on any engine/partitioning."""
    return (
        F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: _q(x)
                * (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{plane_id}|"), d.cast("string"))),
                            1,
                            1,
                        ),
                        16,
                        10,
                    ).cast("long")
                    * 2
                    - 15
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        >= 0
    ).cast("int")


def neardup_pairs_bucketed(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicates: bucket by ``num_planes`` sign bits
    (random-hyperplane LSH); verify quantized cosine ≥ threshold only
    within buckets. Recall is bounded by LSH (documented operator
    contract: near-identical vectors land in the same bucket with
    P = (1 - θ/π)^planes); raise recall with multiple tables if needed."""
    sig = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.concat_ws(
            "", *[_hyperplane_sign(F.col(vec_col), p).cast("string") for p in range(num_planes)]
        ).alias("bucket"),
    )
    a = sig.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b = sig.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
