"""Data-quality operators: single-pass column profiling and rule
validation.

The reference's only data-quality machinery is the `rows_ingested > 0`
write gate (`...sales_fact_01.py:169`) and ledger remarks. These
operators are the engine-native upgrade: profile a table or evaluate a
rule set in ONE aggregation job each — at 100 TB the scan dominates, so
everything is folded into one pass (no per-column or per-rule jobs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row per column: counts, nulls, exact distincts, min/max.

    Single wide aggregate → one scan, one (tiny) result. min/max are
    stringified AFTER aggregation on the native type, so numeric ordering
    is preserved. Exact n_distinct shuffles per column-expand; for quick
    looks at petabyte tables swap in approx_count_distinct upstream.
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = []
    for c in names:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)

    # wide -> long: one stack() expression, still a single job
    parts = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in names
    )
    return row.selectExpr(
        "__n AS n_rows",
        f"stack({len(names)}, {parts}) AS "
        "(col_name, n_non_null, n_distinct, min_value, max_value)",
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_null"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def validate(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate named boolean SQL predicates; return per-rule violation
    counts. One aggregation over one scan regardless of rule count; NULL
    predicate results count as violations (SQL three-valued logic is a
    quality bug, not a pass)."""
    aggs = [
        F.sum(
            F.when(F.expr(pred).eqNullSafe(F.lit(True)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, pred in enumerate(rules.values())
    ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    parts = ", ".join(
        f"{_sql_str(name)}, __v_{i}" for i, name in enumerate(rules)
    )
    return row.selectExpr(
        "__n AS n_rows",
        f"stack({len(rules)}, {parts}) AS (rule, n_violations)",
    ).select("rule", "n_rows", "n_violations")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"
