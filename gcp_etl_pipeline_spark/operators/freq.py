"""Frequent-items (heavy hitters) via mergeable Misra-Gries summaries.

The 100 TB pattern for "which values appear more than φ·N times": exact
counting shuffles one row per distinct value — fine when the vocabulary
is bounded (map-side partial aggregation already collapses each partition
to its local vocabulary), catastrophic when values are near-unique (URLs,
user ids). A Misra-Gries summary caps per-partition state at `capacity`
counters while guaranteeing every item with true count > N/capacity
survives, and summed counters underestimate true counts by at most
N/capacity (Agarwal et al., "Mergeable Summaries", PODS 2012).

Layout mirrors operators/sketches.py's partials contract:
  mg_partials   — bounded-memory per-partition summaries (mapInPandas;
                  the only Python stage, Arrow-batched, state is a dict
                  of ≤capacity counters)
  mg_merge      — counter-sum + (capacity+1)-th-largest subtraction; the
                  combined summary obeys the same N/capacity error bound
  frequent_items — one-shot: partials → merge → threshold filter

When capacity ≥ the distinct-item count of every partition the summary
never evicts, counters are exact, and the result equals the exact
GROUP BY — which is how the DuckDB oracle checks this operator at test
scale while the eviction path is unit-tested separately.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARTIAL_SCHEMA = "item string, cnt long"


_BUFFER_FACTOR = 8


def _compress(counters: dict[str, int], capacity: int) -> dict[str, int]:
    """Shrink to ≤capacity counters by subtracting the (capacity+1)-th
    largest count from every counter and dropping non-positives.

    One compression cancels ≥ (capacity+1)·t units of stream mass while
    subtracting t per survivor, so the total subtraction across a
    partition stays ≤ N/(capacity+1) — the Misra-Gries bound."""
    if len(counters) <= capacity:
        return counters
    t = sorted(counters.values(), reverse=True)[capacity]
    return {k: v - t for k, v in counters.items() if v > t}


def mg_partials(
    items: DataFrame, item_col: str, capacity: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤capacity (item, cnt) rows
    per partition, O(BUFFER_FACTOR × capacity) counters of memory.

    Buffered formulation: each Arrow batch collapses to (item, weight)
    pairs via C-speed value_counts, weights merge into an exact dict, and
    the dict compresses (one sort) only when it outgrows its buffer —
    amortized O(log capacity) per distinct item, no per-row Python work.
    Equivalent error bound to textbook per-row MG; exact whenever a
    partition's distinct-item count never exceeds the buffer."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, w in pdf[item_col].value_counts(dropna=True).items():
                counters[item] = counters.get(item, 0) + int(w)
            if len(counters) > _BUFFER_FACTOR * capacity:
                counters = _compress(counters, capacity)
        counters = _compress(counters, capacity)
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    return items.select(F.col(item_col)).mapInPandas(
        summarize, schema=PARTIAL_SCHEMA
    )


def mg_merge(partials: DataFrame, capacity: int = 4096) -> DataFrame:
    """Merge per-partition summaries into one global summary.

    Counter-wise sum (≤ capacity × n_partitions rows — KBs, not the
    corpus), then subtract the (capacity+1)-th largest summed counter
    from every counter and drop non-positives: the pairwise Misra-Gries
    merge generalized to n summaries, preserving the N/capacity bound.
    """
    summed = partials.groupBy("item").agg(F.sum("cnt").alias("cnt"))
    # (capacity+1)-th largest summed counter via sort-limit — a top-k over
    # the (≤ capacity × n_partitions)-row summary table, never a single
    # driver-sized row. sub=0 when ≤capacity counters survive (exact mode).
    top = summed.orderBy(F.desc("cnt")).limit(capacity + 1)
    kth = top.agg(
        F.coalesce(
            F.when(F.count(F.lit(1)) == capacity + 1, F.min("cnt")),
            F.lit(0),
        ).alias("sub")
    )
    return (
        summed.crossJoin(F.broadcast(kth))
        .select("item", (F.col("cnt") - F.col("sub")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def frequent_items(
    items: DataFrame,
    item_col: str,
    capacity: int = 4096,
    min_count: int | Column = 1,
) -> DataFrame:
    """Items whose (lower-bound) count clears min_count."""
    merged = mg_merge(mg_partials(items, item_col, capacity), capacity)
    return merged.filter(F.col("cnt") >= min_count)
