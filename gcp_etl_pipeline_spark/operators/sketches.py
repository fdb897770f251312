"""Mergeable distinct-count sketches (HyperLogLog, Datasketches-backed).

The 100 TB pattern for COUNT(DISTINCT): exact distinct aggregation
shuffles every distinct value; a per-partition/per-batch HLL sketch is a
few KB regardless of cardinality, merges associatively, and answers with
~1-2% relative error. Spark 4 ships the Apache DataSketches HLL family
as built-ins (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`), so the whole path is JVM-side — no UDFs.

Two-level usage mirrors `operators/ivm.py`'s mergeable-partials contract:
build partials per batch/partition-slice, store them (binary column, a
few KB per group), and merge partials across batches to answer — the
merged estimate is IDENTICAL to sketching the union directly (HLL
register-wise max is exact w.r.t. the sketch), which makes incremental
maintenance of distinct counts lossless at the sketch level.

The reference has no approximate aggregates (SURVEY §2.5 — "Catalyst's
hash-agg covers A1-A4 outright"); this is a scale extension in the same
spirit as `approx_count_distinct` in streaming/core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2m=14 → 16384 registers ≈ 1.04/sqrt(2^14) ≈ 0.8% standard error,
# ~12 KB per sketch: the classic accuracy/size tradeoff point.
DEFAULT_LGK = 14


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` (binary, mergeable)."""
    agg = F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias(sketch_col)
    return df.groupBy(*group_cols).agg(agg)


def hll_merge(
    partials: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge per-batch sketches and estimate the distinct count."""
    return partials.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}))")
        .cast("bigint")
        .alias(out_col)
    )


def hll_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """One-shot grouped approximate distinct count (sketch + estimate)."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_estimate(hll_sketch_agg({value_col}, {lgk}))")
        .cast("bigint")
        .alias(out_col)
    )
