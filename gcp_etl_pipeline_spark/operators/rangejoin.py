"""Range (interval) join — another operator family the reference lacks
(SURVEY §2.4: "Not present in the reference: theta/range/... joins") and
that Spark would otherwise execute as BroadcastNestedLoopJoin (O(n·m)
comparisons even when broadcast).

``range_join(left, intervals, ...)`` matches each left row's scalar
``value_col`` against ``[lo_col, hi_col)`` intervals. Physical design:

  1. each interval is exploded into the fixed-width *chunks* it covers
     (``sequence(floor(lo/w), floor(hi/w))``) — arbitrary, overlapping,
     non-uniform intervals allowed;
  2. left rows compute their single chunk id ``floor(value/w)`` — a pure
     Catalyst projection on the big side;
  3. a join whose condition is chunk-equality AND the exact
     ``lo <= value < hi`` predicate: Catalyst extracts the equality as
     hash-join keys (broadcast when the interval side is small — the
     normal case — so the 100 TB side never shuffles) and applies the
     range as a join filter. Because every left row has exactly ONE
     chunk, each (row, interval) pair is tested at most once — output
     multiplicity is identical to the naive theta join, and
     ``how="left"`` works directly.

Cost: |intervals| grows by ~(width/chunk) copies; the big side gets one
hash probe per row instead of |intervals| comparisons. This is the
standard bucketed interval-join used by range-join hints in commercial
Spark forks and by genomics engines. Pick ``chunk`` near the median
interval width; a too-small chunk only inflates the (small) interval
side, never the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHUNK = "__rj_chunk"


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    chunk: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join rows to the intervals containing them: ``lo <= value < hi``.

    ``extra_on`` adds plain equi-keys to the match (column present on both
    sides). ``how`` is "inner" or "left" (unmatched left rows keep NULL
    interval columns). Overlapping intervals yield one output row per
    covering interval, exactly like the equivalent theta join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    extra_on = extra_on or []
    dup = set(left.columns) & set(intervals.columns) - set(extra_on)
    if dup:
        raise ValueError(f"ambiguous columns {sorted(dup)}: rename one side")

    iv = intervals.withColumn(
        _CHUNK,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / chunk).cast("long"),
                F.floor(F.col(hi_col) / chunk).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    probe = left.withColumn(_CHUNK, F.floor(F.col(value_col) / chunk).cast("long"))

    cond = probe[_CHUNK] == iv[_CHUNK]
    for k in extra_on:
        cond = cond & (probe[k] == iv[k])
    cond = cond & (probe[value_col] >= iv[lo_col]) & (probe[value_col] < iv[hi_col])

    out_cols = [probe[c] for c in left.columns]
    out_cols += [iv[c] for c in intervals.columns if c not in extra_on]
    return probe.join(iv, cond, how).select(*out_cols)
